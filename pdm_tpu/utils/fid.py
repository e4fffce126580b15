"""FID evaluation on-device: batched feature extraction, streaming moments,
Newton-Schulz Frechet distance.

Capability parity: reference ``utils/fid.py`` — streaming feature mean +
full covariance, Frechet distance, reference-stats caching closure,
LeNet features for MNIST and InceptionV3-2048 elsewhere. TPU-first: the
covariance accumulates as (sum, outer-product sum) in fp32 psum-reducible
form, and the matrix sqrt is the fused Newton-Schulz iteration
(ops/sqrtm.py) instead of host SVD.

The Inception path needs pretrained weights; in this offline environment it
loads them from a local npz (``PDM_INCEPTION_WEIGHTS``) when present; the
MNIST/LeNet path is fully self-contained (models/lenet.py trains one).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..ops.sqrtm import trace_sqrtm_product


# ---------------------------------------------------------------------------
# streaming feature moments
# ---------------------------------------------------------------------------


@jax.jit
def _shifted_moment_update(carry, feats: Array, shift: Array, mask: Array):
    """Accumulate first/second moments of (feats - shift) in fp32. With
    shift ~ mu the ss - n*outer(mu,mu) cancellation disappears, so a
    single fp32 pass matches the reference's two-pass torch.cov to within
    rounding (Inception features have large nonzero means).

    ``mask`` (B,): 1.0 for valid rows, 0.0 for padding (the mesh path pads
    the ragged final batch up to the data-axis multiple). Masked rows are
    zeroed BEFORE the sums so they contribute nothing; n counts the mask.

    The accumulators are plain sums over the batch axis, so under a
    ('data',)-sharded batch XLA reduces them with a psum over ICI — this
    jit IS the multi-chip path, no shard_map needed.
    """
    n, s, ss = carry
    feats = (feats.astype(jnp.float32) - shift) * mask[:, None]
    n = n + jnp.sum(mask)
    s = s + jnp.sum(feats, axis=0)
    ss = ss + jnp.dot(feats.T, feats, preferred_element_type=jnp.float32)
    return n, s, ss


def feature_statistics(
    data: Array,
    feature_fn: Callable[[Array], Array],
    feature_dim: int,
    batch_size: int = 500,
    mesh=None,
) -> Tuple[Array, Array]:
    """(mu, Sigma) of features over a dataset, streaming in batches.

    Unbiased covariance (matches torch.cov / the reference). The first
    batch's mean is used as a numerical shift for the outer-product
    accumulator (shifted one-pass covariance).

    ``mesh``: optional ('data','model') Mesh — each batch (and its
    validity mask) is laid out over 'data' before the feature extractor,
    so the per-chip feature batches run data-parallel and the moment sums
    psum-reduce over ICI (SURVEY §7.6). Ragged final batches are padded to
    the data-axis multiple and masked out of the moments exactly.
    """
    n_total = data.shape[0]
    carry = (
        jnp.zeros((), jnp.float32),
        jnp.zeros((feature_dim,), jnp.float32),
        jnp.zeros((feature_dim, feature_dim), jnp.float32),
    )
    batch_sharding_ = mask_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import batch_sharding as _bs

        n_data = mesh.shape.get("data", 1)
        batch_size = max(batch_size // n_data, 1) * n_data
        batch_sharding_ = _bs(mesh)
        mask_sharding = NamedSharding(mesh, P("data"))
    shift = None
    for i in range(0, n_total, batch_size):
        batch = data[i : i + batch_size]
        b = batch.shape[0]
        pad = (-b) % (mesh.shape.get("data", 1) if mesh is not None else 1)
        if pad:
            batch = jnp.concatenate(
                [batch, jnp.zeros((pad, *batch.shape[1:]), batch.dtype)]
            )
        mask = jnp.concatenate(
            [jnp.ones((b,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
        if batch_sharding_ is not None:
            batch = jax.device_put(batch, batch_sharding_)
            mask = jax.device_put(mask, mask_sharding)
        feats = feature_fn(batch)
        if shift is None:
            # first batch is always full (batch_size >= 1 row); its mean
            # is only a numerical shift, exactness not required
            shift = jnp.mean(feats.astype(jnp.float32), axis=0)
        carry = _shifted_moment_update(carry, feats, shift, mask)
    n, s, ss = carry
    mu_c = s / n  # mean of the shifted features
    sigma = (ss - n * jnp.outer(mu_c, mu_c)) / (n - 1.0)
    return mu_c + shift, sigma


@jax.jit
def frechet_distance(mu1: Array, sigma1: Array, mu2: Array, sigma2: Array) -> Array:
    """FID = ||mu1 - mu2||^2 + tr(S1 + S2 - 2 sqrtm(S1 S2))."""
    mean_term = jnp.sum(jnp.square(mu1 - mu2))
    cov_term = (
        jnp.trace(sigma1) + jnp.trace(sigma2)
        - 2.0 * trace_sqrtm_product(sigma1, sigma2)
    )
    return mean_term + cov_term


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------


def lenet_feature_fn(checkpoint_path: str) -> Tuple[Callable[[Array], Array], int]:
    """100-dim LeNet features for MNIST-shaped data (B, 1, H, W) in [-1,1].

    The reference feeds the [-1, 1] tensors straight into LeNet
    (utils/fid.py:40); same here.
    """
    from ..models.lenet import load_lenet

    model, params = load_lenet(checkpoint_path)

    @jax.jit
    def fn(x: Array) -> Array:
        return model.apply({"params": params}, x, features_only=True)

    return fn, 100


def inception_feature_fn() -> Tuple[Callable[[Array], Array], int]:
    """InceptionV3 pool-2048 features (FID-standard) from local weights."""
    path = os.environ.get("PDM_INCEPTION_WEIGHTS")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "InceptionV3 FID weights not available offline; set "
            "PDM_INCEPTION_WEIGHTS to a converted-npz path "
            "(see pdm_tpu/models/inception.py) or use the LeNet path."
        )
    from ..models.inception import load_inception

    model, params = load_inception(path)

    @jax.jit
    def fn(x: Array) -> Array:
        # reference protocol: samples round-trip through uint8 BEFORE the
        # feature extractor (reference utils/fid.py:28 inception(to_uint8(x));
        # to_uint8 truncates, torchmetrics rescales k -> 2k/255 - 1).
        # Quantize identically on-device so generated floats and stored
        # uint8 data see the same inputs.
        k = jnp.clip(
            jnp.floor((jnp.clip(x, -1.0, 1.0) + 1.0) * 127.5), 0.0, 255.0
        )
        return model.apply({"params": params}, k * (2.0 / 255.0) - 1.0)

    return fn, 2048


def get_feature_fn(
    dataset_name: str, lenet_checkpoint: str = "checkpoints/lenet_mnist.npz"
) -> Tuple[Callable[[Array], Array], int]:
    """Dataset dispatch, parity: reference utils/fid.py:43-48."""
    if dataset_name == "mnist":
        return lenet_feature_fn(lenet_checkpoint)
    return inception_feature_fn()


# ---------------------------------------------------------------------------
# the cached-reference closure
# ---------------------------------------------------------------------------


def get_compute_fid(
    reference_data: Array,
    feature_fn: Callable[[Array], Array],
    feature_dim: int,
    batch_size: int = 500,
    mesh=None,
) -> Callable[[Array], float]:
    """Closure caching the reference statistics (parity:
    utils/fid.py:77-86). ``mesh`` shards feature extraction over 'data'."""
    mu_ref, sigma_ref = feature_statistics(
        reference_data, feature_fn, feature_dim, batch_size, mesh=mesh
    )

    def compute(data: Array) -> float:
        mu, sigma = feature_statistics(
            data, feature_fn, feature_dim, batch_size, mesh=mesh
        )
        return float(frechet_distance(mu_ref, sigma_ref, mu, sigma))

    return compute
