"""Chip exactness check: every beam reorder impl vs jnp.take, per dtype.

Caught the mm f32 demotion bug (TPU default-precision matmul rounds f32
operands to bf16 -> int8 self-KV scale buffers degraded every reorder
step). Run on the real chip: CPU keeps f32 and cannot reproduce.
"""
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
from audio_transformers_tpu.models.whisper.beam import _permute_rows_mxu
from audio_transformers_tpu.ops.permute import permute_rows_pallas

rng = np.random.default_rng(0)
rows = 32
bufs = [
    jnp.asarray(rng.integers(-127, 128, (rows, 6, 64, 28)), jnp.int8),
    jnp.asarray(rng.standard_normal((rows, 6, 28)), jnp.float32),
    jnp.asarray(rng.standard_normal((rows, 6, 64, 28)), np.float32).astype(jnp.bfloat16),
    jnp.asarray(rng.integers(0, 2, (rows, 51865)), bool),
]
perm = jnp.asarray(rng.integers(0, rows, rows), jnp.int32)
onehot = jax.nn.one_hot(perm, rows, dtype=jnp.bfloat16)

@jax.jit
def run(bufs, perm, onehot):
    mm = [_permute_rows_mxu(a, onehot) for a in bufs]
    pl = permute_rows_pallas(bufs, perm)
    tk = [jnp.take(a, perm, axis=0) for a in bufs]
    return mm, pl, tk

mm, pl, tk = run(bufs, perm, onehot)
for i, (m, p, t) in enumerate(zip(mm, pl, tk)):
    m, p, t = map(np.asarray, (m, p, t))
    print(i, "mm==take", np.array_equal(m, t), " pl==take", np.array_equal(p, t), flush=True)
    if not np.array_equal(m, t):
        bad = np.argwhere(m != t)
        print("  first mm mismatch", bad[:3], m[tuple(bad[0])], t[tuple(bad[0])])
    if not np.array_equal(p, t):
        bad = np.argwhere(p != t)
        print("  first pl mismatch", bad[:3], p[tuple(bad[0])], t[tuple(bad[0])])
