"""FID machinery: Newton-Schulz sqrtm vs scipy, Gaussian Frechet closed
form, streaming moments, LeNet train/save/load, Inception build."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.ops.sqrtm import sqrtm_newton_schulz, trace_sqrtm_product
from pdm_tpu.utils.fid import (
    feature_statistics,
    frechet_distance,
    get_compute_fid,
)


def random_spd(dim, seed, scale=1.0):
    rng = np.random.RandomState(seed)
    a = rng.randn(dim, dim)
    return (a @ a.T / dim + 0.1 * np.eye(dim)).astype(np.float32) * scale


def test_sqrtm_matches_scipy():
    scipy_linalg = pytest.importorskip("scipy.linalg")
    a = random_spd(64, 0)
    got = np.asarray(sqrtm_newton_schulz(jnp.asarray(a), num_iters=25))
    want = scipy_linalg.sqrtm(a).real
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    # and the trace of the product form
    b = random_spd(64, 1)
    got_tr = float(trace_sqrtm_product(jnp.asarray(a), jnp.asarray(b)))
    want_tr = np.trace(scipy_linalg.sqrtm(a @ b).real)
    np.testing.assert_allclose(got_tr, want_tr, rtol=1e-3)


def test_trace_sqrtm_rank_deficient():
    """Round-3 dress-rehearsal regression: with n_samples << feature_dim
    the covariances are rank-deficient, and the previous Newton-Schulz-
    on-the-jittered-product route inflated every zero eigenvalue of the
    product to sqrt(eps), driving FID NEGATIVE (-1.295 measured at 64
    samples x 2048 features). The symmetric-eigh form must (a) match
    scipy on the singular product and (b) keep the Frechet distance of
    small-sample moments non-negative."""
    scipy_linalg = pytest.importorskip("scipy.linalg")
    dim, n1, n2 = 256, 24, 40  # rank 23 / 39 covariances
    rng = np.random.RandomState(5)

    def cov(n, seed):
        f = np.random.RandomState(seed).randn(n, dim).astype(np.float32)
        f -= f.mean(0, keepdims=True)
        return (f.T @ f / (n - 1)).astype(np.float32)

    a, b = cov(n1, 5), cov(n2, 6)
    got = float(trace_sqrtm_product(jnp.asarray(a), jnp.asarray(b)))
    want = float(np.trace(scipy_linalg.sqrtm(a.astype(np.float64) @ b).real))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    f1 = rng.randn(n1, dim).astype(np.float32)
    f2 = rng.randn(n2, dim).astype(np.float32) + 0.1
    mu1, mu2 = f1.mean(0), f2.mean(0)
    s1 = np.cov(f1, rowvar=False).astype(np.float32)
    s2 = np.cov(f2, rowvar=False).astype(np.float32)
    fid = float(
        frechet_distance(
            jnp.asarray(mu1), jnp.asarray(s1), jnp.asarray(mu2),
            jnp.asarray(s2),
        )
    )
    assert fid >= 0.0, fid


def test_frechet_gaussian_closed_form():
    """FID between N(m1, s1 I) and N(m2, s2 I) in dim d:
    ||m1-m2||^2 + d (sqrt(s1) - sqrt(s2))^2."""
    d = 32
    mu1 = jnp.zeros(d)
    mu2 = jnp.full((d,), 0.5)
    s1, s2 = 2.0, 0.5
    fid = float(
        frechet_distance(
            mu1, s1 * jnp.eye(d), mu2, s2 * jnp.eye(d)
        )
    )
    want = d * 0.25 + d * (np.sqrt(s1) - np.sqrt(s2)) ** 2
    np.testing.assert_allclose(fid, want, rtol=1e-3)


def test_feature_statistics_streaming():
    rng = np.random.RandomState(2)
    data = rng.randn(1000, 16).astype(np.float32)
    mu, sigma = feature_statistics(
        jnp.asarray(data), lambda x: x, 16, batch_size=128
    )
    np.testing.assert_allclose(np.asarray(mu), data.mean(0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sigma), np.cov(data.T), rtol=1e-4, atol=1e-5
    )


def test_compute_fid_closure_discriminates():
    """FID(ref, ref-like) << FID(ref, shifted)."""
    rng = np.random.RandomState(3)
    ref = rng.randn(2000, 8).astype(np.float32)
    close = rng.randn(2000, 8).astype(np.float32)
    far = close + 2.0
    compute = get_compute_fid(jnp.asarray(ref), lambda x: x, 8)
    fid_close = compute(jnp.asarray(close))
    fid_far = compute(jnp.asarray(far))
    assert fid_close < 0.2
    assert fid_far > 8.0 * 4 * 0.9  # ~ d * shift^2


def test_lenet_train_and_features(tmp_path):
    from pdm_tpu.models.lenet import LeNet, load_lenet, save_lenet, train_lenet

    rng = np.random.RandomState(4)
    # two linearly separable classes
    x = rng.randn(512, 1, 8, 8).astype(np.float32)
    y = (x.reshape(512, -1).sum(1) > 0).astype(np.int32)
    model, params = train_lenet(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y),
        batch_size=64, epochs=8, verbose=False,
    )
    logits = model.apply({"params": params}, jnp.asarray(x))
    acc = float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(y)))
    assert acc > 0.9
    feats = model.apply({"params": params}, jnp.asarray(x[:10]), features_only=True)
    assert feats.shape == (10, 100)
    # save/load roundtrip
    path = str(tmp_path / "lenet.npz")
    save_lenet(params, path)
    _, params2 = load_lenet(path)
    logits2 = LeNet().apply({"params": params2}, jnp.asarray(x[:10]))
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(logits[:10]), atol=1e-5
    )


def test_inception_builds_and_runs():
    """Random-init InceptionV3 produces 2048-dim features on 32x32 input
    (resized internally to 299)."""
    from pdm_tpu.models.inception import InceptionV3Features

    model = InceptionV3Features()
    x = jnp.zeros((2, 3, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 2048)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    # torchvision inception_v3 feature trunk is ~21.8M params
    assert 20e6 < n_params < 25e6, f"{n_params/1e6:.1f}M"


def test_inception_torch_conversion_structure():
    """The torch-state-dict converter produces the exact flax param tree."""
    from pdm_tpu.models.inception import (
        InceptionV3Features, convert_torch_state_dict,
    )

    model = InceptionV3Features()
    x = jnp.zeros((1, 3, 32, 32), jnp.float32)
    ref_params = jax.eval_shape(lambda k: model.init(k, x)["params"], jax.random.PRNGKey(0))

    # synthesize a fake torch state dict with matching shapes
    fake_sd = {}

    def walk(tree, scope):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, scope + [k])
            else:
                if k == "kernel":
                    h, w, i, o = v.shape
                    fake_sd[".".join(scope[:-1]) + ".conv.weight"] = np.zeros(
                        (o, i, h, w), np.float32
                    )
                else:
                    name = {
                        "bn_scale": "weight", "bn_bias": "bias",
                        "bn_mean": "running_mean", "bn_var": "running_var",
                    }[k]
                    fake_sd[".".join(scope) + f".bn.{name}"] = np.zeros(
                        v.shape, np.float32
                    )

    walk(ref_params, [])
    converted = convert_torch_state_dict(fake_sd)
    ref_paths = {
        tuple(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(ref_params)[0]
    }
    conv_paths = {
        tuple(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    assert ref_paths == conv_paths


def test_feature_statistics_mesh_matches_single_device():
    """SURVEY §7.6 / VERDICT r2 weak #6: the mesh path (batches laid out
    over 'data', moment sums psum-reduced) must reproduce the single-device
    moments exactly — including a ragged final batch (padded + masked) and
    a batch_size not divisible by the data axis."""
    from pdm_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(4)
    # 1000 rows, batch 130 -> mesh path rounds to 128 (data=8) and the
    # final batch is ragged on both paths
    data = rng.randn(1000, 16).astype(np.float32)
    mu_ref, sigma_ref = feature_statistics(
        jnp.asarray(data), lambda x: x, 16, batch_size=130
    )
    mesh = make_mesh(data=8, model=1)
    mu_m, sigma_m = feature_statistics(
        jnp.asarray(data), lambda x: x, 16, batch_size=130, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(mu_m), data.mean(0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sigma_m), np.cov(data.T), rtol=1e-4, atol=1e-5
    )
    # and the two paths agree with each other to float tolerance
    np.testing.assert_allclose(
        np.asarray(mu_m), np.asarray(mu_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sigma_m), np.asarray(sigma_ref), rtol=1e-4, atol=1e-5
    )


def test_compute_fid_mesh_closure():
    """get_compute_fid(mesh=...) matches the unsharded closure."""
    from pdm_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(5)
    ref = rng.randn(512, 8).astype(np.float32)
    x = (rng.randn(400, 8) * 1.1 + 0.3).astype(np.float32)
    fid_single = get_compute_fid(jnp.asarray(ref), lambda x: x, 8)(
        jnp.asarray(x)
    )
    mesh = make_mesh(data=4, model=2)
    fid_mesh = get_compute_fid(
        jnp.asarray(ref), lambda x: x, 8, mesh=mesh
    )(jnp.asarray(x))
    np.testing.assert_allclose(fid_mesh, fid_single, rtol=1e-4, atol=1e-4)
