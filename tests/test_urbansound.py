"""UrbanSound model + trainer tests.

Includes a logit-parity test against a torch replica of the reference
architecture (the committed reference model crashes on init —
urban_sounds/model.py:153 `torch.arrange` typo — so the replica implements
the documented intent with that bug fixed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import (MelConfig, OptimizerConfig,
                                                TrainConfig,
                                                UrbanSoundConfig)
from audio_transformers_tpu.data.synthetic import SyntheticClassification
from audio_transformers_tpu.models import urbansound
from audio_transformers_tpu.train.optim import PlateauScheduler


SMALL = UrbanSoundConfig(n_mels=64, num_classes=10, conv_dim=32,
                         encoder_dim=32, num_encoder_blocks=2, num_heads=4,
                         dropout=0.0, cnn_dims=(32, 48))


def test_forward_shapes_and_jit():
    params, state = urbansound.init(jax.random.PRNGKey(0), SMALL)
    mel = jnp.zeros((3, 173, 64))
    fwd = jax.jit(lambda p, s, m: urbansound.apply(p, s, SMALL, m))
    logits, new_state = fwd(params, state, mel)
    assert logits.shape == (3, 10)
    assert jnp.isfinite(logits).all()
    # BN stats threaded, pos preserved
    assert new_state["pos"].shape == state["pos"].shape


def test_param_count_matches_reference_architecture():
    """Reference defaults ~= 3.9M params (SURVEY.md §2 #6)."""
    cfg = UrbanSoundConfig()
    params, _ = urbansound.init(jax.random.PRNGKey(0), cfg)
    from audio_transformers_tpu.core.pytree import param_count
    n = param_count(params)
    assert 3_000_000 < n < 5_000_000, n


def test_logit_parity_with_torch_replica():
    import torch
    import torch.nn as tnn

    cfg = SMALL
    params, state = urbansound.init(jax.random.PRNGKey(1), cfg)

    class Block(tnn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.attn_ln = tnn.LayerNorm(d)
            self.attn = tnn.MultiheadAttention(d, h, dropout=0.0,
                                               batch_first=True)
            self.mlp_ln = tnn.LayerNorm(d)
            self.fc1 = tnn.Linear(d, 4 * d)
            self.fc2 = tnn.Linear(4 * d, d)

        def forward(self, x):
            h = self.attn_ln(x)
            x = x + self.attn(h, h, h)[0]
            h = self.mlp_ln(x)
            x = x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))
            return x

    class Ref(tnn.Module):
        """The reference UrbanSoundModel's intent
        (urban_sounds/model.py:95-214), channels-first."""

        def __init__(self, c):
            super().__init__()
            self.conv1 = tnn.Conv1d(c.n_mels, c.conv_dim, 3, padding=1)
            self.conv2 = tnn.Conv1d(c.conv_dim, c.conv_dim, 3, stride=2,
                                    padding=1)
            self.bn1 = tnn.BatchNorm1d(c.conv_dim)
            self.bn2 = tnn.BatchNorm1d(c.conv_dim)
            self.blocks = tnn.ModuleList(
                [Block(c.encoder_dim, c.num_heads)
                 for _ in range(c.num_encoder_blocks)])
            self.ln_post = tnn.LayerNorm(c.encoder_dim)
            self.cnns = tnn.ModuleList()
            in_d = c.encoder_dim
            for d in c.cnn_dims:
                self.cnns.append(tnn.ModuleDict({
                    "conv": tnn.Conv1d(in_d, d, 3, padding=1),
                    "bn": tnn.BatchNorm1d(d)}))
                in_d = d
            self.cls = tnn.Linear(c.cnn_dims[-1], c.num_classes)

        def forward(self, x, pos):
            g = torch.nn.functional.gelu
            x = g(self.bn1(self.conv1(x)))
            x = g(self.bn2(self.conv2(x)))
            x = x.transpose(1, 2)
            x = x + pos[: x.size(1)]
            for b in self.blocks:
                x = b(x)
            x = self.ln_post(x)
            x = x.transpose(1, 2)
            for m in self.cnns:
                x = g(m["bn"](m["conv"](x)))
            x = x.mean(dim=2)
            return self.cls(x)

    tm = Ref(cfg).eval()

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    sd = {}
    sd["conv1.weight"] = t(params["conv1"]["w"]).permute(2, 1, 0)
    sd["conv1.bias"] = t(params["conv1"]["b"])
    sd["conv2.weight"] = t(params["conv2"]["w"]).permute(2, 1, 0)
    sd["conv2.bias"] = t(params["conv2"]["b"])
    for bn in ("bn1", "bn2"):
        sd[f"{bn}.weight"] = t(params[bn]["scale"])
        sd[f"{bn}.bias"] = t(params[bn]["bias"])
        sd[f"{bn}.running_mean"] = t(state[bn]["mean"])
        sd[f"{bn}.running_var"] = t(state[bn]["var"])
    for i, bp in enumerate(params["blocks"]):
        pre = f"blocks.{i}"
        sd[f"{pre}.attn_ln.weight"] = t(bp["attn_ln"]["scale"])
        sd[f"{pre}.attn_ln.bias"] = t(bp["attn_ln"]["bias"])
        qw, kw, vw = (t(bp["attn"][k]["w"]).T for k in ("q", "k", "v"))
        qb, kb, vb = (t(bp["attn"][k]["b"]) for k in ("q", "k", "v"))
        sd[f"{pre}.attn.in_proj_weight"] = torch.cat([qw, kw, vw], 0)
        sd[f"{pre}.attn.in_proj_bias"] = torch.cat([qb, kb, vb], 0)
        sd[f"{pre}.attn.out_proj.weight"] = t(bp["attn"]["o"]["w"]).T
        sd[f"{pre}.attn.out_proj.bias"] = t(bp["attn"]["o"]["b"])
        sd[f"{pre}.mlp_ln.weight"] = t(bp["mlp_ln"]["scale"])
        sd[f"{pre}.mlp_ln.bias"] = t(bp["mlp_ln"]["bias"])
        sd[f"{pre}.fc1.weight"] = t(bp["fc1"]["w"]).T
        sd[f"{pre}.fc1.bias"] = t(bp["fc1"]["b"])
        sd[f"{pre}.fc2.weight"] = t(bp["fc2"]["w"]).T
        sd[f"{pre}.fc2.bias"] = t(bp["fc2"]["b"])
    sd["ln_post.weight"] = t(params["ln_post"]["scale"])
    sd["ln_post.bias"] = t(params["ln_post"]["bias"])
    for i, cp in enumerate(params["cnn"]):
        sd[f"cnns.{i}.conv.weight"] = t(cp["conv"]["w"]).permute(2, 1, 0)
        sd[f"cnns.{i}.conv.bias"] = t(cp["conv"]["b"])
        sd[f"cnns.{i}.bn.weight"] = t(cp["bn"]["scale"])
        sd[f"cnns.{i}.bn.bias"] = t(cp["bn"]["bias"])
        sd[f"cnns.{i}.bn.running_mean"] = t(state["cnn"][i]["mean"])
        sd[f"cnns.{i}.bn.running_var"] = t(state["cnn"][i]["var"])
    sd["cls.weight"] = t(params["cls"]["w"]).T
    sd["cls.bias"] = t(params["cls"]["b"])
    tm.load_state_dict(sd)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 173, SMALL.n_mels)).astype(np.float32)
    ours, _ = urbansound.apply(params, state, cfg, jnp.asarray(mel),
                               training=False)
    with torch.no_grad():
        theirs = tm(t(mel).transpose(1, 2),
                    t(np.asarray(state["pos"]))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               rtol=2e-4, atol=2e-4)


def test_overfit_one_batch():
    """SURVEY.md §4 prescription (f): training drives loss down."""
    from audio_transformers_tpu.train.classifier import make_steps
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.parallel.mesh import build_mesh, shard_batch, replicated

    mel_cfg = MelConfig.urbansound()
    tcfg = TrainConfig(
        batch_size=8, num_epochs=1, compute_dtype="float32",
        optimizer=OptimizerConfig(name="adam", learning_rate=1e-3,
                                  schedule="constant"))
    ds = SyntheticClassification(num_samples=8, num_classes=4,
                                 duration=1.0)
    batch = next(ds.batcher(8).train_epochs(epoch=0))

    tx = build_optimizer(tcfg.optimizer)
    params, state = urbansound.init(jax.random.PRNGKey(0), SMALL)
    opt_state = tx.init(params)
    train_step, _ = make_steps(SMALL, mel_cfg, tcfg, tx)

    mesh = build_mesh()
    sb = shard_batch(batch, mesh)
    params = jax.device_put(params, replicated(mesh))
    state = jax.device_put(state, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        rng, k = jax.random.split(rng)
        params, state, opt_state, m = train_step(params, state, opt_state,
                                                 sb, k)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.3 * losses[0], losses
    assert losses[-1] < 0.5, losses


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_data_parallel_step_on_mesh():
    """The same step over an 8-device data mesh: runs, stays replicated."""
    from audio_transformers_tpu.train.classifier import make_steps
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.parallel.mesh import (build_mesh,
                                                      replicated,
                                                      shard_batch)

    mel_cfg = MelConfig.urbansound()
    tcfg = TrainConfig(batch_size=16, compute_dtype="float32",
                       optimizer=OptimizerConfig(name="adam",
                                                 learning_rate=1e-3,
                                                 schedule="constant"))
    ds = SyntheticClassification(num_samples=16, num_classes=4, duration=1.0)
    batch = next(ds.batcher(16).train_epochs(epoch=0))

    mesh = build_mesh()
    assert mesh.devices.size == 8
    tx = build_optimizer(tcfg.optimizer)
    params, state = urbansound.init(jax.random.PRNGKey(0), SMALL)
    params = jax.device_put(params, replicated(mesh))
    state = jax.device_put(state, replicated(mesh))
    opt_state = jax.device_put(tx.init(params), replicated(mesh))
    train_step, eval_step = make_steps(SMALL, mel_cfg, tcfg, tx)

    sb = shard_batch(batch, mesh)
    assert sb["waveform"].sharding.spec[0] == "data"
    params, state, opt_state, m = train_step(params, state, opt_state, sb,
                                             jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    out = eval_step(params, state, sb)
    assert float(out["count"]) == 16.0


def test_eval_masking_exact():
    """Padded final eval batch must not pollute metrics."""
    from audio_transformers_tpu.train.classifier import (evaluate,
                                                         make_steps)
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.parallel.mesh import build_mesh

    mel_cfg = MelConfig.urbansound()
    tcfg = TrainConfig(batch_size=8, compute_dtype="float32",
                       optimizer=OptimizerConfig(schedule="constant"))
    ds = SyntheticClassification(num_samples=11, num_classes=4, duration=1.0)
    tx = build_optimizer(tcfg.optimizer)
    params, state = urbansound.init(jax.random.PRNGKey(0), SMALL)
    _, eval_step = make_steps(SMALL, mel_cfg, tcfg, tx)
    mesh = build_mesh((("data", 1),))
    out = evaluate(eval_step, params, state, ds.batcher(8), mesh)
    # 11 samples -> batches of 8 + 3(padded to 8); count must be exactly 11
    total = 0.0
    for batch in ds.batcher(8).eval_batches():
        total += batch["valid"].sum()
    assert total == 11
    assert 0.0 <= out["accuracy"] <= 1.0


def test_plateau_scheduler_semantics():
    sched = PlateauScheduler(OptimizerConfig(learning_rate=1.0,
                                             plateau_patience=2,
                                             plateau_factor=0.1))
    lrs = [sched.step(v) for v in [1.0, 0.9, 0.95, 0.95, 0.95, 0.8]]
    # improvements at 1.0,0.9; then 3 bad epochs > patience 2 -> reduce once
    assert lrs == [1.0, 1.0, 1.0, 1.0, 0.1, 0.1]
