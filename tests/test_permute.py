"""ops/permute.py: the Pallas row-permute gather-copy vs jnp.take."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_transformers_tpu.ops.permute import permute_rows_pallas

INTERPRET = jax.default_backend() != "tpu"


def _bufs(rng, rows):
    """Beam-cache-shaped mix: bf16 K/V blocks, f32 scales, int8 quant,
    and a 2D bool mask (lifted to 3D internally for Mosaic's block
    rules — the beam seen mask is (rows, V))."""
    return [
        jnp.asarray(rng.standard_normal((rows, 3, 8, 16)), jnp.float32)
        .astype(jnp.bfloat16),
        jnp.asarray(rng.standard_normal((rows, 3, 16)), jnp.float32),
        jnp.asarray(rng.integers(-127, 128, (rows, 3, 8, 16)), jnp.int8),
        jnp.asarray(rng.integers(0, 2, (rows, 37)), bool),
    ]


@pytest.mark.parametrize("rows", [8, 16])
def test_matches_take(rows):
    rng = np.random.default_rng(0)
    bufs = _bufs(rng, rows)
    # beam parents repeat rows (branching) — not a pure permutation
    perm = jnp.asarray(rng.integers(0, rows, rows), jnp.int32)
    got = permute_rows_pallas(bufs, perm, interpret=INTERPRET)
    for g, a in zip(got, bufs):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(jnp.take(a, perm, axis=0)))
        assert g.dtype == a.dtype


def test_identity_and_reverse():
    rng = np.random.default_rng(1)
    bufs = _bufs(rng, 8)
    ident = jnp.arange(8, dtype=jnp.int32)
    rev = ident[::-1]
    for g, a in zip(permute_rows_pallas(bufs, ident, interpret=INTERPRET),
                    bufs):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(a))
    for g, a in zip(permute_rows_pallas(bufs, rev, interpret=INTERPRET),
                    bufs):
        np.testing.assert_array_equal(np.asarray(g),
                                      np.asarray(a)[::-1])


def test_under_jit_and_scan():
    """The production use: permute carried buffers inside a loop."""
    rng = np.random.default_rng(2)
    bufs = _bufs(rng, 8)

    @jax.jit
    def run(bufs):
        def body(bs, perm):
            return permute_rows_pallas(bs, perm, interpret=INTERPRET), None
        perms = jnp.stack([(jnp.arange(8, dtype=jnp.int32) + s) % 8
                           for s in (1, 3)])
        bs, _ = jax.lax.scan(body, list(bufs), perms)
        return bs

    got = run(bufs)
    want = bufs
    for s in (1, 3):
        perm = (np.arange(8) + s) % 8
        want = [jnp.take(a, perm, axis=0) for a in want]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
