"""Hash-grid encoder: parity against an independent numpy transcription of the
reference CUDA kernel semantics (encoder/hashencoder/src/hashencoder.cu), plus
gradient/scatter behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatarcraft_tpu.ops.hash_encoder import (
    HashGridSpec,
    hash_encode,
    init_hash_table,
)

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def numpy_reference_encode(table, x, spec, size=1.0):
    """Slow per-point/per-level transcription of the CUDA kernel math."""
    scales, resolutions, offsets, sizes, use_hash = spec.level_constants
    x01 = (np.asarray(x, np.float64) + size) / (2 * size)
    N = x01.shape[0]
    out = np.zeros((N, spec.num_levels * spec.level_dim), np.float64)
    for n in range(N):
        if np.any(x01[n] < 0) or np.any(x01[n] > 1):
            continue
        for lvl in range(spec.num_levels):
            scale = scales[lvl]
            res = resolutions[lvl]
            hsize = sizes[lvl]
            pos = x01[n].astype(np.float32) * np.float32(scale) + 0.5
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            acc = np.zeros(spec.level_dim)
            for corner in range(8):
                w = 1.0
                pgl = pg.copy()
                for d in range(3):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        pgl[d] += 1
                    else:
                        w *= 1 - frac[d]
                if use_hash[lvl]:
                    idx = np.uint64(0)
                    for d in range(3):
                        idx ^= np.uint64((pgl[d] * PRIMES[d]) % (1 << 32))
                else:
                    idx = pgl[0] + pgl[1] * (res + 1) + pgl[2] * (res + 1) ** 2
                idx = int(idx % np.uint64(hsize)) + offsets[lvl]
                acc += w * np.asarray(table[idx], np.float64)
            out[n, lvl * spec.level_dim : (lvl + 1) * spec.level_dim] = acc
    return out


@pytest.fixture(scope="module")
def small_spec():
    # small enough for the numpy reference, still exercises dense AND hashed levels
    return HashGridSpec(
        num_levels=6,
        level_dim=2,
        base_resolution=4,
        log2_hashmap_size=8,
        desired_resolution=64,
    )


def test_default_spec_matches_reference_layout():
    spec = HashGridSpec()
    scales, resolutions, offsets, sizes, use_hash = spec.level_constants
    # reference: per_level_scale = exp2(log2(2048/16)/15) = 1.3819...
    assert abs(spec.per_level_scale - 1.3819) < 1e-3
    assert resolutions[0] == 16 and resolutions[-1] == 2048
    # dense until (res+1)^3 > 2^19
    assert sizes[0] == 17**3 and not use_hash[0]
    assert sizes[-1] == 2**19 and use_hash[-1]
    assert spec.output_dim == 32


def test_forward_matches_numpy_reference(small_spec, rng):
    table = rng.normal(size=(small_spec.total_params, 2)).astype(np.float32)
    x = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(x), small_spec))
    want = numpy_reference_encode(table, x, small_spec)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_oob_inputs_zero(small_spec, rng):
    table = rng.normal(size=(small_spec.total_params, 2)).astype(np.float32)
    x = np.array([[1.5, 0.0, 0.0], [0.0, -1.0001, 0.2]], np.float32)
    got = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(x), small_spec))
    np.testing.assert_array_equal(got, 0.0)


def test_batch_shape_roundtrip(small_spec):
    table = init_hash_table(jax.random.PRNGKey(0), small_spec)
    x = jnp.zeros((4, 5, 3))
    out = hash_encode(table, x, small_spec)
    assert out.shape == (4, 5, small_spec.output_dim)


def test_grad_is_scatter_add(small_spec, rng):
    """d(sum(out))/d(table) must equal accumulated interpolation weights."""
    table = jnp.asarray(rng.normal(size=(small_spec.total_params, 2)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-0.9, 0.9, size=(16, 3)).astype(np.float32))

    grad = jax.grad(lambda t: hash_encode(t, x, small_spec).sum())(table)
    assert np.isfinite(np.asarray(grad)).all()
    # weights along each level sum to 1 per point, and out is linear in table:
    # total grad mass = num_points * num_levels * level_dim... per channel:
    np.testing.assert_allclose(
        np.asarray(grad).sum(), 16 * small_spec.num_levels * small_spec.level_dim, rtol=1e-4
    )


def test_input_grad_piecewise_linear(small_spec, rng):
    """Autodiff through trilinear interp gives finite-difference-consistent input grads."""
    table = jnp.asarray(rng.normal(size=(small_spec.total_params, 2)).astype(np.float32))
    x = jnp.asarray([[0.123, -0.456, 0.789]], jnp.float32)

    f = lambda xx: hash_encode(table, xx, small_spec).sum()
    g = jax.grad(f)(x)
    eps = 1e-4
    for d in range(3):
        dx = jnp.zeros_like(x).at[0, d].set(eps)
        fd = (f(x + dx) - f(x - dx)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[0, d], np.asarray(fd), rtol=5e-2, atol=1e-2)


def test_gather_layouts_numerically_identical(small_spec, rng):
    """'leveled' (per-level small-table gathers, the TPU-fast grouping) and
    'flat' (per-corner whole-table gathers) must be the same function — same
    values AND same table gradients, including out-of-bound zeroing."""
    table = jnp.asarray(rng.normal(size=(small_spec.total_params, 2)).astype(np.float32))
    x = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-1, 1, size=(48, 3)),
                [[1.5, 0.0, 0.0]],  # OOB
            ]
        ).astype(np.float32)
    )
    a = hash_encode(table, x, small_spec, layout="leveled")
    b = hash_encode(table, x, small_spec, layout="flat")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    ga = jax.grad(lambda t: (hash_encode(t, x, small_spec, layout="leveled") ** 2).sum())(table)
    gb = jax.grad(lambda t: (hash_encode(t, x, small_spec, layout="flat") ** 2).sum())(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-7)


def test_jit_and_vmap_compose(small_spec):
    table = init_hash_table(jax.random.PRNGKey(1), small_spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 3), minval=-1, maxval=1)
    eager = hash_encode(table, x, small_spec)
    jitted = jax.jit(lambda t, xx: hash_encode(t, xx, small_spec))(table, x)
    # jit fuses the multiply-add chain differently; allow a few ulps
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-9)


def test_dense_cell_packing_exact():
    """Cell-packed dense levels produce bit-identical features to the
    per-corner gather path (pack_dense_cells + hash_encode packed_cells)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.ops.hash_encoder import (
        HashGridSpec,
        hash_encode,
        init_hash_table,
        pack_dense_cells,
    )

    spec = HashGridSpec(
        num_levels=6, base_resolution=4, log2_hashmap_size=8,
        desired_resolution=64,
    )
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    packed = pack_dense_cells(table, spec)
    assert packed, "expected at least one dense level at this spec"
    _, _, _, _, use_hash = spec.level_constants
    assert set(packed) == {l for l in range(6) if not use_hash[l]}

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1.1, 1.1, (513, 3)).astype(np.float32))
    ref = hash_encode(table, x, spec, size=1.0)
    out = hash_encode(table, x, spec, size=1.0, packed_cells=packed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-7)

    # gradients w.r.t. the table agree too (training path)
    def loss_packed(t):
        p = pack_dense_cells(t, spec)
        return (hash_encode(t, x, spec, packed_cells=p) ** 2).sum()

    def loss_plain(t):
        return (hash_encode(t, x, spec) ** 2).sum()

    g1 = jax.grad(loss_packed)(table)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
