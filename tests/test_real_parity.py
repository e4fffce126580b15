"""Real-asset parity tests — auto-skip until ``fetch_assets.py`` lands bytes.

This file is the executable form of BASELINE.md's quality rows (the
reference's saved notebook outputs, `analyze_fids.ipynb` cells 4/10/11).
The environment ships no MNIST/CIFAR pixels, no FID Inception weights,
and no pretrained ``google/ddpm-cifar10-32`` UNet, so every test here
skips cleanly offline; the day ``python scripts/fetch_assets.py`` lands
the assets (see its manifest), this suite asserts the rows.

Two assertion tiers:
  * default: reduced sample counts — sanity bands wide enough to absorb
    small-sample FID bias, still tight enough to catch a broken import
    or feature stack (FID at 1k samples sits tens above the 50k value).
  * PDM_PARITY_FULL=1: the reference protocol (50,000 samples,
    `config/dataset_configs.py:16`) with parity tolerances. Hours on CPU;
    run on the TPU chip (PDM_TPU_TESTS=1).

Reference protocol being reproduced: FID against the train split with
InceptionV3-2048 features (LeNet features for MNIST), reference
`utils/fid.py:43-48`; sampling via the schedule named in each row.
"""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from fetch_assets import (  # noqa: E402
    DATA_CACHE,
    INCEPTION_NPZ,
    PRETRAINED,
    landed_status,
)

LANDED = landed_status()
FULL = os.environ.get("PDM_PARITY_FULL") == "1"

needs = lambda *a: pytest.mark.skipif(  # noqa: E731
    not all(LANDED.get(k) for k in a),
    reason=f"assets {a} not landed (run scripts/fetch_assets.py)",
)
slow = pytest.mark.slow


def _config(dataset):
    from pdm_tpu.config.config import Config

    return Config(dataset_name=dataset)


def _load_cache(name, split):
    from pdm_tpu import runtime

    return np.asarray(
        runtime.read_cache(os.path.join(DATA_CACHE, f"{name}_{split}.pdmc"))
    )


@needs("mnist")
def test_mnist_cache_geometry():
    imgs = _load_cache("mnist", "train")
    assert imgs.shape[0] == 60000
    assert imgs.shape[1:] in ((32, 32, 1), (1, 32, 32))
    assert imgs.dtype == np.uint8


@needs("cifar10")
def test_cifar10_cache_geometry():
    train = _load_cache("cifar10", "train")
    test = _load_cache("cifar10", "test")
    assert train.shape[0] == 50000 and test.shape[0] == 10000
    assert train.dtype == np.uint8


@needs("inception")
def test_inception_features_finite_2048():
    os.environ.setdefault("PDM_INCEPTION_WEIGHTS", INCEPTION_NPZ)
    import jax.numpy as jnp

    from pdm_tpu.utils.fid import inception_feature_fn

    fn, dim = inception_feature_fn()
    assert dim == 2048
    feats = np.asarray(fn(jnp.zeros((2, 3, 32, 32)) + 0.1))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()


@needs("ddpm-cifar10")
def test_pretrained_unet_converts_and_denoises():
    """Every tensor of the real checkpoint must map into the flax tree,
    and one denoising step at mid-noise must move a noisy image toward
    lower energy (prediction finite, non-trivial)."""
    import jax
    import jax.numpy as jnp

    from pdm_tpu.models.from_config import ddpm_from_config

    cfg = _config("cifar10")
    cfg.ddpm.model_name = "diffusers"
    cfg.ddpm.diffusers_path = PRETRAINED
    ddpm = ddpm_from_config(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    preds = ddpm.get_predictions(x, jnp.zeros((2,)))
    x0 = np.asarray(preds.x0)
    assert np.isfinite(x0).all()
    # a real denoiser pulls unit-variance noise toward the data scale
    assert 0.05 < float(np.std(x0)) < 1.5


# ---------------------------------------------------------------------------
# BASELINE.md rows
# ---------------------------------------------------------------------------


@slow
@needs("mnist")
def test_mnist_train_vs_test_fid_floor():
    """BASELINE.md: MNIST train-vs-test FID floor 3.150
    (`analyze_fids.ipynb` cell 10). The floor depends on the trained
    LeNet feature net (ours is freshly trained, reference's is not
    shipped), so the band is generous; under the full protocol we
    additionally require the same order of magnitude."""
    import jax
    import jax.numpy as jnp

    from pdm_tpu.models.lenet import train_lenet
    from pdm_tpu.utils.fid import get_compute_fid

    def to_pm1(u8):
        arr = np.asarray(u8, np.float32) / 255.0 * 2.0 - 1.0
        if arr.shape[-1] == 1:  # NHWC cache -> NCHW
            arr = np.transpose(arr, (0, 3, 1, 2))
        return arr

    train_imgs = to_pm1(_load_cache("mnist", "train"))
    test_imgs = to_pm1(_load_cache("mnist", "test"))
    labels_path = os.path.join(DATA_CACHE, "mnist_train_labels.npy")
    if not os.path.exists(labels_path):
        pytest.skip("mnist labels sidecar missing; re-land with fetch_assets")
    labels = np.load(labels_path).astype(np.int32)
    n = 50000 if FULL else 10000
    model, params = train_lenet(
        jax.random.PRNGKey(0),
        jnp.asarray(train_imgs[:n]),
        jnp.asarray(labels[:n]),
        epochs=5 if FULL else 2,
        verbose=False,
    )

    def feat(x):
        return model.apply({"params": params}, x, features_only=True)

    compute_fid = get_compute_fid(jnp.asarray(train_imgs[:n]), feat, 100)
    floor = compute_fid(jnp.asarray(test_imgs[: min(n, 10000)]))
    assert 0.3 < floor < 12.0, f"train-vs-test FID floor {floor}"


@slow
@needs("ddpm-cifar10", "cifar10", "inception")
@pytest.mark.parametrize(
    "schedule,n_steps,ref_fid",
    [("linear_beta", 10, 35.69), ("linear_beta", 50, 13.44),
     ("cosine", 50, 17.77)],
)
def test_cifar10_pretrained_fid_rows(schedule, n_steps, ref_fid):
    """BASELINE.md CIFAR-10 rows (`analyze_fids.ipynb` cell 11) via the
    pretrained google/ddpm-cifar10-32 UNet — the reference's
    `cifar10_metric_exp.py` protocol. Default tier samples 1,024 images
    (small-sample FID bias: assert < ref + 60); PDM_PARITY_FULL=1 runs
    the 50k protocol and asserts ±30%."""
    os.environ.setdefault("PDM_INCEPTION_WEIGHTS", INCEPTION_NPZ)
    import jax.numpy as jnp

    from pdm_tpu.diffusion.sampling import get_samples
    from pdm_tpu.models.from_config import ddpm_from_config
    from pdm_tpu.schedulers.from_config import scheduler_from_config
    from pdm_tpu.utils.fid import get_compute_fid, inception_feature_fn

    cfg = _config("cifar10")
    cfg.ddpm.model_name = "diffusers"
    cfg.ddpm.diffusers_path = PRETRAINED
    ddpm = ddpm_from_config(cfg)
    sample_sched = scheduler_from_config(cfg, noise_schedule_type=schedule)
    n_samples = 50000 if FULL else 1024
    samples = get_samples(
        ddpm,
        sample_sched,
        n_steps=n_steps,
        obj_size=cfg.dataset_config.obj_size,
        n_samples=n_samples,
        batch_size=500 if FULL else 256,
        step_type="ddpm",
    )["x"]

    train = _load_cache("cifar10", "train")
    arr = np.asarray(train, np.float32) / 255.0 * 2.0 - 1.0
    if arr.shape[-1] == 3:
        arr = np.transpose(arr, (0, 3, 1, 2))
    n_ref = 50000 if FULL else 10000
    fn, dim = inception_feature_fn()
    compute_fid = get_compute_fid(jnp.asarray(arr[:n_ref]), fn, dim)
    fid = compute_fid(jnp.asarray(samples))
    if FULL:
        assert abs(fid - ref_fid) / ref_fid < 0.30, (
            f"{schedule}@{n_steps}: FID {fid:.2f} vs reference {ref_fid}"
        )
    else:
        assert fid < ref_fid + 60.0, (
            f"{schedule}@{n_steps}: small-sample FID {fid:.2f} implausibly "
            f"far above the 50k reference {ref_fid}"
        )
