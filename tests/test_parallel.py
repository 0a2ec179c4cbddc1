"""Multi-device (8 virtual CPU) sharding tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mesh_and_sharding_helpers():
    from piv_liteflownet_tpu.parallel.mesh import data_sharding, make_mesh, replicated

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    x = jnp.zeros((16, 4))
    xs = jax.device_put(x, data_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    p = jax.device_put(x, replicated(mesh))
    assert p.sharding.is_fully_replicated


def test_dp_train_step_matches_single_device():
    """The 8-way data-parallel step must produce the same update as the
    single-device step on the identical global batch (SPMD correctness)."""
    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.parallel.mesh import data_sharding, make_mesh, replicated
    from piv_liteflownet_tpu.parallel.train_step import TrainState, make_train_step
    from piv_liteflownet_tpu.training.loss import piv_loss
    from piv_liteflownet_tpu.training.optim import make_optimizer

    model = piv_liteflownet(version=1)
    tx, _ = make_optimizer(model.params, 1, lr=1e-4)
    loss_obj = piv_loss(version=1)

    rng = np.random.default_rng(0)
    img1 = rng.random((8, 32, 32, 3), dtype=np.float32)
    img2 = rng.random((8, 32, 32, 3), dtype=np.float32)
    target = rng.standard_normal((8, 32, 32, 2)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    def run(mesh):
        step = make_train_step(model.cfg, loss_obj, tx, mesh=mesh)
        if mesh is not None:
            put_b = lambda x: jax.device_put(x, data_sharding(mesh))
            put_r = lambda t: jax.device_put(t, replicated(mesh))
        else:
            put_b = put_r = jax.device_put
        # fresh copies: the step donates its state, which would otherwise
        # delete model.params for the second run
        params = jax.tree.map(jnp.array, model.params)
        state = put_r(TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)))
        state, metrics = step(
            state, put_b(jnp.asarray(img1)), put_b(jnp.asarray(img2)),
            put_b(jnp.asarray(target)), key)
        return state, metrics

    mesh = make_mesh(8)
    s_dp, m_dp = run(mesh)
    s_1, m_1 = run(None)

    assert abs(float(m_dp["loss"]) - float(m_1["loss"])) < 1e-5
    w_dp = np.asarray(s_dp.params["NetE_M.5.conv_M.0.weight"])
    w_1 = np.asarray(s_1.params["NetE_M.5.conv_M.0.weight"])
    np.testing.assert_allclose(w_dp, w_1, atol=1e-6)


def test_graft_entry_single_chip():
    """entry() must return a jittable fn + example args that execute."""
    import __graft_entry__ as ge

    fn, (params, img1, img2) = ge.entry()
    out = jax.jit(fn)(params, img1, img2)
    assert out.shape == (1, 256, 256, 2)
    assert bool(jnp.isfinite(out).all())


def test_dryrun_multichip_integration():
    """The driver's multichip entry: full DP train step on the 8-CPU mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally on NaN / device count
