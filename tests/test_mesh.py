"""Mesh/sharding foundation tests on the 8-device virtual CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.core.mesh import (
    MeshContext,
    make_mesh_context,
    parse_mesh_shape,
)


def test_parse_mesh_shape():
    assert parse_mesh_shape(None, 8) == {"dp": 8, "mp": 1}
    assert parse_mesh_shape("dp=4,mp=2", 8) == {"dp": 4, "mp": 2}
    assert parse_mesh_shape("dp=-1,mp=2", 8) == {"dp": 4, "mp": 2}
    # sub-meshes are allowed (leading devices used); oversubscription is not
    assert parse_mesh_shape("dp=3", 8) == {"dp": 3, "mp": 1}
    with pytest.raises(ValueError):
        parse_mesh_shape("dp=16", 8)


def test_mesh_context_dp8():
    ctx = make_mesh_context("dp=8,mp=1")
    assert ctx.dp_size == 8
    assert ctx.pad_batch(5) == 8
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xd = jax.device_put(x, ctx.batch_sharding)
    assert len(xd.sharding.device_set) == 8

    # data-parallel mean: GSPMD inserts the cross-device reduction
    @jax.jit
    def f(a):
        return jnp.mean(a)

    np.testing.assert_allclose(float(f(xd)), x.mean(), rtol=1e-6)


def test_mesh_context_2d():
    ctx = make_mesh_context("dp=4,mp=2")
    assert ctx.dp_size == 4 and ctx.mp_size == 2
    s = ctx.sharding("dp", None, "mp")
    x = np.ones((4, 3, 2), np.float32)
    xd = jax.device_put(x, s)
    assert xd.shape == (4, 3, 2)


def test_param_shardings_fno():
    from realpdebench_tpu.config import Config
    from realpdebench_tpu.core.partitioning import param_shardings, shard_train_state
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer, make_train_step,
    )
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    import jax.numpy as jnp

    ctx = make_mesh_context("dp=4,mp=2")
    shape = (4, 16, 16, 3)
    bundle = build_model(shapes=(shape, shape), model_name="fno",
                         modes1=2, modes2=3, modes3=3, n_layers=2, width=8)
    x = np.random.default_rng(0).standard_normal((8, *shape)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x[:1])
    params, ms = bundle.split_variables(variables)

    shardings = param_shardings(params, ctx)
    spec = shardings["layer_0"]["spectral"]["w_real"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, None, None, None, "mp")
    # biases replicated
    assert shardings["fc0"]["bias"].spec == jax.sharding.PartitionSpec()

    # full sharded train step executes with tp+dp
    cfg = Config(lr=1e-3, scheduler="cosine", num_update=4, clip_grad_norm=0.0)
    state = TrainState.create(params, ms, build_optimizer(cfg))
    state = shard_train_state(state, ctx)
    step = make_train_step(bundle, IdentityNormalizer(), ctx)
    xd = jax.device_put(x, ctx.batch_sharding)
    state, loss = step(state, xd, xd, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # weights remain mp-sharded after the update
    w = state.params["layer_0"]["spectral"]["w_real"]
    assert len(w.sharding.device_set) >= 2


class _RecordingDataset:
    """Map-style dataset recording which indices were touched."""

    def __init__(self, n=32, shape=(2, 4, 4, 3)):
        self.n = n
        self.shape = shape
        self.touched = set()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.touched.add(int(i))
        x = np.full(self.shape, float(i), np.float32)
        return x, x + 0.5


def test_process_sharded_loader_partitions_batches():
    """Multi-host data sharding (SURVEY §2.5 consequence 2): with a shared
    shuffle seed, the per-process slices of every global batch are disjoint,
    cover the batch exactly, and concatenate back to the single-process
    batch."""
    from realpdebench_tpu.data.loader import DataLoader

    n_proc, bs = 4, 8
    ref_ds = _RecordingDataset()
    ref_loader = DataLoader(ref_ds, batch_size=bs, shuffle=True, seed=7,
                            drop_last=True)
    ref_batches = list(ref_loader)

    proc_batches = []
    proc_touched = []
    for p in range(n_proc):
        ds = _RecordingDataset()
        loader = DataLoader(ds, batch_size=bs, shuffle=True, seed=7,
                            drop_last=True, process_shard=True,
                            process_count=n_proc, process_index=p)
        proc_batches.append(list(loader))
        proc_touched.append(ds.touched)

    # each process touches exactly 1/n_proc of the items, disjoint
    per = len(ref_ds) // n_proc
    assert all(len(t) == per for t in proc_touched)
    union = set().union(*proc_touched)
    assert len(union) == len(ref_ds)

    # concatenating the per-process slices reproduces the global batch
    for step, (rx, ry) in enumerate(ref_batches):
        gx = np.concatenate([proc_batches[p][step][0] for p in range(n_proc)])
        gy = np.concatenate([proc_batches[p][step][1] for p in range(n_proc)])
        np.testing.assert_array_equal(gx, rx)
        np.testing.assert_array_equal(gy, ry)


def test_process_shard_requires_divisible_batch():
    from realpdebench_tpu.data.loader import DataLoader

    with np.testing.assert_raises(ValueError):
        DataLoader(_RecordingDataset(), batch_size=6, process_shard=True,
                   process_count=4, process_index=0)


def test_prefetch_assembles_on_single_process():
    """prefetch_to_device with a dp-sharded mesh: batches come out globally
    shaped and dp-sharded (the multi-process branch reduces to this when
    process_count == 1)."""
    from realpdebench_tpu.core.prefetch import prefetch_to_device

    mesh8 = make_mesh_context("dp=8,mp=1")

    batches = [(np.ones((8, 3, 3), np.float32) * i,
                np.ones((8, 2), np.float32) * i) for i in range(3)]
    out = list(prefetch_to_device(iter(batches), mesh8.batch_sharding))
    assert len(out) == 3
    for i, (x, y) in enumerate(out):
        assert x.shape == (8, 3, 3)
        assert len(x.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(x), batches[i][0])


@pytest.mark.parametrize("family", ["unet", "dpot"])
def test_dp_mp_train_step_other_families(family):
    """One dp=4×mp=2 train step for conv-heavy (UNet) and patch/spectral
    (DPOT) trees — GSPMD evidence beyond FNO (VERDICT round-2 item 5).
    FNO's dp×mp step is covered by the driver dryrun + test_partitioning."""
    from __graft_entry__ import _DRYRUN_FAMILIES, _dryrun_one

    ctx = make_mesh_context("dp=4,mp=2")
    loss = _dryrun_one(ctx, family, _DRYRUN_FAMILIES[family])
    assert np.isfinite(loss)


def test_mesh_helpers_single_process_noop():
    """assemble_from_process_local / allgather_to_host (used by the train
    and surrogate validation loops) must be exact no-ops on single-process
    runs — multi-host is simulated at the DataLoader level above; these
    helpers' process_count>1 branches mirror run_validation's former
    closures verbatim."""
    from realpdebench_tpu.core.mesh import (
        allgather_to_host,
        assemble_from_process_local,
    )

    ctx = make_mesh_context("dp=8,mp=1")
    x = np.arange(24, dtype=np.float32).reshape(8, 3)
    assert assemble_from_process_local(x, ctx) is x
    got = allgather_to_host(jnp.asarray(x) * 2)
    np.testing.assert_array_equal(got, x * 2)
