"""Subprocess worker for the REAL multi-process test (not collected by
pytest — no test_ prefix). Runs ONE DP classifier train step through the
actual library path (initialize_if_multihost -> build_mesh -> Batcher
process_sharded slicing -> shard_batch -> train_step) and dumps the
updated params, so the parent can assert a 2-process run equals the
1-process run. See tests/test_distributed_real.py.

Usage: python distributed_worker.py <pid> <nproc> <port> <out.npz>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
out_path = sys.argv[4]

# conftest recipe: the tunnel plugin re-registers itself when
# JAX_PLATFORMS merely says "cpu" — drop the var, pin via jax.config.
os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from audio_transformers_tpu.parallel.distributed import (  # noqa: E402
    initialize_if_multihost)

if nproc > 1:
    ok = initialize_if_multihost(coordinator=f"127.0.0.1:{port}",
                                 num_processes=nproc, process_id=pid)
    assert ok and jax.process_count() == nproc, jax.process_count()

import numpy as np  # noqa: E402

from audio_transformers_tpu.core.config import (MelConfig,  # noqa: E402
                                                OptimizerConfig,
                                                TrainConfig,
                                                UrbanSoundConfig)
from audio_transformers_tpu.data.loader import Batcher  # noqa: E402
from audio_transformers_tpu.data.synthetic import (  # noqa: E402
    SyntheticClassification)
from audio_transformers_tpu.models import urbansound  # noqa: E402
from audio_transformers_tpu.parallel.mesh import (build_mesh,  # noqa: E402
                                                  replicated, shard_batch)
from audio_transformers_tpu.train.classifier import make_steps  # noqa: E402

# dropout 0: removes any PRNG-partitioning dependence on mesh layout so
# the 1-vs-2-process comparison is purely about data/collective plumbing
cfg = UrbanSoundConfig(conv_dim=32, encoder_dim=64, num_heads=4,
                       num_encoder_blocks=2, cnn_dims=(32, 64),
                       dropout=0.0)
mel_cfg = MelConfig.urbansound()
tcfg = TrainConfig(batch_size=8, compute_dtype="float32",
                   optimizer=OptimizerConfig(name="adam",
                                             learning_rate=1e-3,
                                             schedule="constant"))
# plain SGD for the step under test: the param delta is then lr * grad,
# so a 1-vs-2-process compare is well-conditioned. Adam's first step is
# ~lr * sign(g) — discontinuous in g — and amplifies the benign 1e-6
# reduction-order noise of a different device split to ~2*lr.
import optax  # noqa: E402

mesh = build_mesh()          # all global devices on the "data" axis
assert mesh.devices.size == 2 * nproc

ds = SyntheticClassification(num_samples=8, duration=1.0, seed=7)
batcher = Batcher(ds, ds.num_samples, batch_size=8, seed=3,
                  process_sharded=nproc > 1)

params, state = urbansound.init(jax.random.PRNGKey(0), cfg)
tx = optax.sgd(1e-2)
params = jax.device_put(params, replicated(mesh))
state = jax.device_put(state, replicated(mesh))
opt_state = jax.device_put(tx.init(params), replicated(mesh))
train_step, _ = make_steps(cfg, mel_cfg, tcfg, tx)

batch = next(batcher.train_epochs(epoch=0))
assert batch["waveform"].shape[0] == 8 // nproc  # local rows only
params, state, opt_state, metrics = train_step(
    params, state, opt_state, shard_batch(batch, mesh),
    jax.random.PRNGKey(1))

if pid == 0:
    leaves = {f"p{i}": np.asarray(x.addressable_data(0))
              for i, x in enumerate(jax.tree.leaves(params))}
    leaves["loss"] = np.asarray(metrics["loss"].addressable_data(0))
    np.savez(out_path, **leaves)
    print("saved", out_path, "loss", float(leaves["loss"]), flush=True)
