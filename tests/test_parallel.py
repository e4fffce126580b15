"""Parallelism: sharded sampling parity and mesh helpers on the 8-device
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pdm_tpu.diffusion.sampling import DDPMSampler
from pdm_tpu.models.base import TrueDDPM
from pdm_tpu.parallel.distributed import sharded_sampler
from pdm_tpu.parallel.mesh import make_mesh, params_sharding, shard_batch
from pdm_tpu.schedulers.analytic import LogSNRScheduler
from pdm_tpu.utils.synthetic import generate_gmm_1d


def test_sharded_sampling_matches_unsharded():
    data = jnp.asarray(generate_gmm_1d(10_000))
    sched = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=sched, train_data=data)
    sampler = DDPMSampler(
        ddpm=ddpm, scheduler=sched, n_steps=8, obj_size=(1, 1, 1),
        batch_size=64, n_samples=64, step_type="ddim",
    )
    ref = sampler.batch_sample(jax.random.PRNGKey(0))["x"]

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sh = sharded_sampler(sampler, mesh)
        got = sh.batch_sample(jax.random.PRNGKey(0))["x"]
    # deterministic DDIM with identical keys -> identical values
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_mesh_and_param_sharding_rules():
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 16, 64)), "bias": jnp.zeros((64,))},
        "norm": {"scale": jnp.zeros((33,))},
    }
    shardings = params_sharding(params, mesh)
    assert shardings["conv"]["kernel"].spec == P(None, None, None, "model")
    assert shardings["conv"]["bias"].spec == P()  # 1-D: replicated
    assert shardings["norm"]["scale"].spec == P()  # not divisible

    x = shard_batch(jnp.zeros((16, 3)), mesh)
    assert x.sharding.spec == P("data")


def test_thermo_sweep_sharded_matches():
    """thermo_sweep with the dataset axis sharded over the mesh equals the
    single-device sweep (same keys -> same noise -> exact psum merge)."""
    import numpy as np

    from pdm_tpu.stats.sweep import thermo_sweep

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(16 * 8, 6).astype(np.float32))
    temp = np.logspace(-1, 1, 5)
    mesh = make_mesh(data=8, model=1)
    ref = thermo_sweep(jax.random.PRNGKey(0), data, temp, n_samples=64,
                       batch_size=64)
    got = thermo_sweep(jax.random.PRNGKey(0), data, temp, n_samples=64,
                       batch_size=64, mesh=mesh)
    np.testing.assert_allclose(got["entropy"], ref["entropy"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["metric"], ref["metric"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        got["free_energy"], ref["free_energy"], rtol=1e-4, atol=1e-4
    )


def test_thermo_sweep_sharded_uneven_dataset():
    """N not divisible by the mesh data axis: the sharded sweep truncates
    the (< axis_size) remainder instead of erroring."""
    import numpy as np

    from pdm_tpu.stats.sweep import thermo_sweep

    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.randn(16 * 8 + 5, 6).astype(np.float32))
    temp = np.logspace(-1, 1, 4)
    mesh = make_mesh(data=8, model=1)
    out = thermo_sweep(jax.random.PRNGKey(0), data, temp, n_samples=32,
                       batch_size=32, mesh=mesh)
    assert np.all(np.isfinite(out["entropy"]))
    assert np.all(np.isfinite(out["metric"]))


def test_mesh_from_config():
    from pdm_tpu.config.config import ParallelConfig
    from pdm_tpu.parallel.mesh import check_batch_divisible, mesh_from_config

    # explicit layout
    mesh = mesh_from_config(ParallelConfig(data_axis=4, model_axis=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # default: all visible devices on 'data'
    mesh = mesh_from_config(ParallelConfig())
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    # single visible device + no request -> None (scripts skip sharding)
    mesh1 = mesh_from_config(ParallelConfig(), devices=jax.devices()[:1])
    assert mesh1 is None
    # oversubscription is a loud error
    import pytest

    with pytest.raises(ValueError, match="devices"):
        mesh_from_config(ParallelConfig(data_axis=16, model_axis=1))
    with pytest.raises(ValueError, match="divisible"):
        check_batch_divisible(12, mesh, what="batch")
    # AUTO sizing shrinks to a batch-compatible width with a warning...
    with pytest.warns(UserWarning, match="auto mesh"):
        mesh_a = mesh_from_config(ParallelConfig(), batch_size=100)
    assert dict(mesh_a.shape) == {"data": 5, "model": 1}  # max divisor <= 8
    # ...and collapses to single-device rather than failing
    with pytest.warns(UserWarning, match="auto mesh"):
        assert mesh_from_config(ParallelConfig(), batch_size=1) is None
    # an EXPLICIT data_axis stays loud (no silent shrink)
    mesh_e = mesh_from_config(
        ParallelConfig(data_axis=8), batch_size=100
    )
    assert dict(mesh_e.shape) == {"data": 8, "model": 1}
    # with accumulation the MICRO-batch governs the auto-shrink: global
    # bs=16 / grad_accum=4 -> micro=4, so data=4 (not 8, which would fail
    # the trainer's micro-batch divisibility check later)
    with pytest.warns(UserWarning, match="micro-batch"):
        mesh_g = mesh_from_config(
            ParallelConfig(), batch_size=16, grad_accum=4
        )
    assert dict(mesh_g.shape) == {"data": 4, "model": 1}
    # divisible micro-batch: no shrink, no warning
    mesh_g2 = mesh_from_config(ParallelConfig(), batch_size=64, grad_accum=2)
    assert dict(mesh_g2.shape) == {"data": 8, "model": 1}


def test_trainer_train_mesh_matches_single_device():
    """trainer.train(mesh=...) (the CLI path) logs step-for-step identical
    losses to the unsharded loop: DP/TP resharding must not change math."""
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.unet import UNet2D
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler

    net = UNet2D(
        in_channels=1, out_channels=1, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"), layers_per_block=1,
        attention_head_dim=8, norm_groups=4, dropout=0.0,
    )
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), LinearBetaScheduler(1e-4, 1e2), net,
        (1, 16, 16), parametrization="eps",
    )
    data = jnp.asarray(
        np.random.RandomState(0).randn(64, 1, 16, 16).astype(np.float32)
    )

    def run(mesh):
        logged = {}
        trainer = DDPMTrainer(
            ddpm=ddpm, learning_rate=1e-3, warmup_steps=1, total_iters=3,
            grad_clip=1.0, ema_decay=0.99,
            log_fn=lambda step, m: logged.__setitem__(step, m["loss"]),
        )
        trainer.train(data, batch_size=16, total_iters=3, log_every=1,
                      mesh=mesh)
        return logged

    ref = run(None)
    mesh = make_mesh(data=4, model=2)
    with mesh:
        got = run(mesh)
    assert set(ref) == set(got) == {1, 2, 3}
    for step in ref:
        np.testing.assert_allclose(got[step], ref[step], rtol=1e-4)


def test_trainer_train_mesh_rejects_bad_batch():
    import pytest

    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.base import TrueDDPM

    trainer = DDPMTrainer(ddpm=None)
    mesh = make_mesh(data=8, model=1)
    with pytest.raises(ValueError, match="divisible"):
        trainer.train(jnp.zeros((8, 1, 2, 2)), batch_size=12, total_iters=1,
                      mesh=mesh)


def test_tp_step_hlo_has_no_large_activation_allgathers():
    """model=2 TP train step: compiled HLO must reduce over the sharded
    channel contraction (all-reduce / reduce-scatter) rather than
    all-gathering full conv activations; and it must numerically match the
    replicated step (covered by the parity test above)."""
    import re

    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.unet import UNet2D
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.parallel.mesh import unet_with_tp
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler

    net = UNet2D(
        in_channels=1, out_channels=1, block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"), layers_per_block=1,
        attention_head_dim=8, norm_groups=4, dropout=0.0,
    )
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), LinearBetaScheduler(1e-4, 1e2), net,
        (1, 16, 16), parametrization="eps",
    )
    mesh = make_mesh(data=4, model=2)
    trainer = DDPMTrainer(
        ddpm=ddpm, learning_rate=1e-3, warmup_steps=1, total_iters=4,
        grad_clip=1.0, ema_decay=0.99,
    )
    trainer.ddpm = __import__("dataclasses").replace(
        ddpm, module=unet_with_tp(net, mesh)
    )
    batch = shard_batch(jnp.zeros((32, 1, 16, 16), jnp.float32), mesh)
    with mesh:
        state = trainer.init_state(mesh=mesh)
        step = trainer._build_train_step()
        txt = step.lower(state, jax.random.PRNGKey(1), batch).compile().as_text()

    # gradient reduction over 'data' must exist
    assert "all-reduce" in txt or "reduce-scatter" in txt

    # no all-gather producing a tensor at/above the full activation size
    # (bs=32 x 16 x 16 x 16 = 131072 elements)
    sizes = []
    for m in re.finditer(r"all-gather[^=]*=\s*\(?[a-z0-9]+\[([0-9,]*)\]", txt):
        dims = [int(d) for d in m.group(1).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        sizes.append(n)
    big = [s for s in sizes if s >= 32 * 16 * 16 * 16]
    assert not big, f"full-activation all-gathers in TP step: {sorted(sizes)[-5:]}"


def test_checkpoint_resume_preserves_mesh_sharding(tmp_path):
    """Orbax restore hands back host arrays; load_checkpoint must re-place
    them with the template's TP/DP shardings or the resumed run silently
    trains with compiler-default replication."""
    from tests.test_unet_trainer import make_trainer

    mesh = make_mesh(data=4, model=2)
    trainer = make_trainer(tmp_path)
    with mesh:
        state = trainer.init_state(mesh=mesh)
        trainer.save_checkpoint(state, 1, block=True)
        restored = trainer.load_checkpoint(state, 1)

    want = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, state)
    )
    got = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, restored)
    )
    assert got == want
    # and at least one parameter leaf is actually model-sharded (not all
    # replicated), so the assertion above is non-vacuous
    assert any(
        not s.is_fully_replicated for s in got
    ), "expected some TP-sharded leaves in the template state"


def _tiny_unet(**kw):
    from pdm_tpu.models.unet import UNet2D

    defaults = dict(
        in_channels=1, out_channels=1, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"), layers_per_block=1,
        attention_head_dim=8, norm_groups=4, dropout=0.0,
    )
    defaults.update(kw)
    return UNet2D(**defaults)


def test_sp_forward_matches_unsharded():
    """Spatial parallelism: the UNet forward with the activation H axis
    sharded over 'model' (GSPMD halo-exchange convs, psum GroupNorm
    moments, gathered attention) equals the single-device forward."""
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.parallel.mesh import shard_params, unet_with_sp
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler

    net = _tiny_unet()
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), LinearBetaScheduler(1e-4, 1e2), net,
        (1, 16, 16), parametrization="eps",
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, 16, 16, 1).astype(np.float32)
    )
    tau = jnp.linspace(0.1, 0.9, 4)
    ref = ddpm.module.apply({"params": ddpm.params}, x, tau)

    mesh = make_mesh(data=2, model=4)
    sp_net = unet_with_sp(net, mesh)
    with mesh:
        params = shard_params(ddpm.params, mesh, "spatial")
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))

        @jax.jit
        def fwd(p, x, tau):
            return sp_net.apply({"params": p}, x, tau)

        got = fwd(params, xs, tau)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_trainer_train_sp_mesh_matches_single_device():
    """trainer.train(mesh=..., model_partition='spatial') logs step-for-step
    identical losses to the unsharded loop."""
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler

    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), LinearBetaScheduler(1e-4, 1e2), _tiny_unet(),
        (1, 16, 16), parametrization="eps",
    )
    data = jnp.asarray(
        np.random.RandomState(0).randn(64, 1, 16, 16).astype(np.float32)
    )

    def run(mesh, partition):
        logged = {}
        trainer = DDPMTrainer(
            ddpm=ddpm, learning_rate=1e-3, warmup_steps=1, total_iters=3,
            grad_clip=1.0, ema_decay=0.99, model_partition=partition,
            log_fn=lambda step, m: logged.__setitem__(step, m["loss"]),
        )
        trainer.train(data, batch_size=16, total_iters=3, log_every=1,
                      mesh=mesh)
        return logged

    ref = run(None, "channel")
    mesh = make_mesh(data=2, model=4)
    with mesh:
        got = run(mesh, "spatial")
    assert set(ref) == set(got) == {1, 2, 3}
    for step in ref:
        np.testing.assert_allclose(got[step], ref[step], rtol=1e-4)


def test_sp_step_hlo_has_halo_exchange_and_grad_allreduce():
    """model=4 SP train step HLO: the spatially-partitioned 3x3 convs must
    exchange halo rows via collective-permute over the mesh, and the DP
    gradient all-reduce must be present."""
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.parallel.mesh import unet_with_sp
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler

    net = _tiny_unet(block_out_channels=(16, 32))
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), LinearBetaScheduler(1e-4, 1e2), net,
        (1, 16, 16), parametrization="eps",
    )
    mesh = make_mesh(data=2, model=4)
    trainer = DDPMTrainer(
        ddpm=ddpm, learning_rate=1e-3, warmup_steps=1, total_iters=4,
        grad_clip=1.0, ema_decay=0.99, model_partition="spatial",
    )
    trainer.ddpm = __import__("dataclasses").replace(
        ddpm, module=unet_with_sp(net, mesh)
    )
    batch = shard_batch(jnp.zeros((16, 1, 16, 16), jnp.float32), mesh)
    with mesh:
        state = trainer.init_state(mesh=mesh)
        step = trainer._build_train_step()
        txt = step.lower(state, jax.random.PRNGKey(1), batch).compile().as_text()

    assert "collective-permute" in txt, "no halo exchange in SP step HLO"
    assert "all-reduce" in txt or "reduce-scatter" in txt


def test_sp_param_sharding_replicates_everything():
    mesh = make_mesh(data=4, model=2)
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 16, 64)), "bias": jnp.zeros((64,))},
    }
    shardings = params_sharding(params, mesh, "spatial")
    assert shardings["conv"]["kernel"].spec == P()
    assert shardings["conv"]["bias"].spec == P()

    import pytest

    with pytest.raises(ValueError, match="partition"):
        params_sharding(params, mesh, "pipeline")


def test_spatial_sharded_sampling_matches_unsharded():
    """sharded_sampler(partition='spatial'): DP batch + SP image-H sharding
    through the whole reverse scan equals the single-device trajectories
    (deterministic DDIM, identical keys)."""
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler

    sched = LinearBetaScheduler(1e-4, 1e2)
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), sched, _tiny_unet(), (1, 16, 16),
        parametrization="eps",
    )
    sampler = DDPMSampler(
        ddpm=ddpm, scheduler=sched, n_steps=4, obj_size=(1, 16, 16),
        batch_size=8, n_samples=8, step_type="ddim",
    )
    ref = sampler.batch_sample(jax.random.PRNGKey(0))["x"]

    mesh = make_mesh(data=2, model=4)
    with mesh:
        sh = sharded_sampler(sampler, mesh, partition="spatial")
        got = sh.batch_sample(jax.random.PRNGKey(0))["x"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

    # TrueDDPM has no spatial activations: loud error, not silent fallback
    import pytest

    data = jnp.asarray(generate_gmm_1d(1000))
    tsampler = DDPMSampler(
        ddpm=TrueDDPM(scheduler=sched, train_data=data), scheduler=sched,
        n_steps=4, obj_size=(1, 1, 1), batch_size=8, n_samples=8,
        step_type="ddim",
    )
    with pytest.raises(ValueError, match="spatial"):
        sharded_sampler(tsampler, mesh, partition="spatial")
