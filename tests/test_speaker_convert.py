"""Pretrained speaker-encoder conversion: torch state dict -> flax.

Executes the reference ``SpeakerRAVE`` (``rave/blocks.py:1022-1147``)
from its own file (no code copied), captures its state dict with the
``__S__.`` prefix the VoxCeleb checkpoints use (``rave/model.py:278-299``)
and asserts the converted flax module produces the same embedding on the
same input -- the "loading a (synthetic) torch state dict bit-matches
embeddings" requirement.  Also covers the trainable-speaker-encoder
fallback (no pretrained weights -> encoder joins the optimizer group).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/rave"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference checkout not present")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rave_tpu.models.speaker import SpeakerRAVE  # noqa: E402
from rave_tpu.models.speaker_convert import (  # noqa: E402
    convert_speaker_state, strip_speaker_statedict)


def _faithful_cc_stub():
    """A cached_conv stand-in with REAL centered-padding semantics (the
    parity loader's (0,0) stub is fine for shape-free modules; the
    speaker net needs matching time alignment)."""
    import torch.nn.functional as F
    cc = types.ModuleType("cached_conv")

    def get_padding(kernel_size, stride=1, dilation=1, mode="centered"):
        if kernel_size == 1:
            return (0, 0)
        p = (kernel_size - 1) * dilation + 1 - stride
        if mode == "causal":
            return (p, 0)
        return ((p + 1) // 2, p // 2)

    class Conv1d(torch.nn.Conv1d):
        def __init__(self, *a, padding=(0, 0), cumulative_delay=0, **kw):
            pad = padding if isinstance(padding, (tuple, list)) \
                else (padding, padding)
            self._pad = tuple(int(p) for p in pad)
            super().__init__(*a, padding=0, **kw)
            self.cumulative_delay = 0

        def forward(self, x):
            return super().forward(F.pad(x, self._pad))

    class AlignBranches(torch.nn.Module):
        def __init__(self, *branches, delays=None, cumulative_delay=0,
                     stride=1):
            super().__init__()
            self.branches = torch.nn.ModuleList(branches)
            self.cumulative_delay = 0

        def forward(self, x):
            return [b(x) for b in self.branches]

    class CachedSequential(torch.nn.Sequential):
        def __init__(self, *mods, cumulative_delay=0):
            super().__init__(*mods)
            self.cumulative_delay = 0

    cc.Conv1d = Conv1d
    cc.ConvTranspose1d = torch.nn.ConvTranspose1d
    cc.AlignBranches = AlignBranches
    cc.CachedSequential = CachedSequential
    cc.get_padding = get_padding
    cc.MAX_BATCH_SIZE = 4
    cc.USE_BUFFER_CONV = False
    cc.use_cached_conv = lambda *a, **k: None
    return cc


@pytest.fixture(scope="module")
def ref_blocks():
    """Load reference blocks.py inside a shim package so its relative
    ``from .core import`` works, with era-pinned deps stubbed."""
    stubs = {}
    for s in ["GPUtil", "librosa", "lmdb", "udls", "gin",
              "pytorch_lightning", "torchaudio", "cached_conv"]:
        stubs[s] = sys.modules.get(s)
    try:
        for s in ["GPUtil", "librosa", "lmdb", "udls"]:
            sys.modules[s] = types.ModuleType(s)
        gin = types.ModuleType("gin")
        gin.configurable = (lambda *a, **k:
                            (a[0] if a and callable(a[0])
                             else (lambda f: f)))
        gin.external_configurable = gin.configurable
        sys.modules["gin"] = gin
        pl = types.ModuleType("pytorch_lightning")
        pl.Callback = type("Callback", (), {})
        pl.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = pl
        ta = types.ModuleType("torchaudio")
        ta.transforms = types.ModuleType("torchaudio.transforms")
        ta.transforms.Spectrogram = torch.nn.Identity
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = ta.transforms
        sys.modules["cached_conv"] = _faithful_cc_stub()

        pkg = types.ModuleType("_refrave")
        pkg.__path__ = [REF_DIR]
        sys.modules["_refrave"] = pkg
        for name in ["core", "blocks"]:
            spec = importlib.util.spec_from_file_location(
                f"_refrave.{name}", os.path.join(REF_DIR, f"{name}.py"))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"_refrave.{name}"] = mod
            spec.loader.exec_module(mod)
        yield sys.modules["_refrave.blocks"]
    finally:
        for s, old in stubs.items():
            if old is None:
                sys.modules.pop(s, None)
            else:
                sys.modules[s] = old
        for s in ["_refrave", "_refrave.core", "_refrave.blocks",
                  "torchaudio.transforms"]:
            sys.modules.pop(s, None)


def _embed_parity(ref_blocks, use_weight_norm):
    torch.manual_seed(0)
    ref = ref_blocks.SpeakerRAVE()
    if use_weight_norm:
        from torch.nn.utils import weight_norm
        for name in ["in_layer", "cat_layer", "out_layer"]:
            setattr(ref, name, weight_norm(getattr(ref, name)))
        for lname in ["layer2", "layer3", "layer4"]:
            seq = getattr(ref, lname)
            unit = seq[0].aligned.branches[0].net
            unit[1] = weight_norm(unit[1])
            unit[3] = weight_norm(unit[3])
            seq[2] = weight_norm(seq[2])
    ref.eval()

    # simulate the VoxCeleb checkpoint layout: __S__. prefix + pqmf blobs
    sd = {f"__S__.{k}": v for k, v in ref.state_dict().items()}
    sd["__S__.pqmf.hk"] = torch.zeros(3)

    speaker_sd, pqmf_sd = strip_speaker_statedict(
        {k: v.numpy() for k, v in sd.items()})
    assert "hk" in pqmf_sd
    params, stats = convert_speaker_state(speaker_sd)

    T = 2048
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, T)).astype(np.float32) * 0.3
    with torch.no_grad():
        e_ref = ref(torch.from_numpy(x)).numpy()

    m = SpeakerRAVE()
    init_vars = m.init(jax.random.PRNGKey(0),
                       jnp.asarray(x.transpose(0, 2, 1)))
    # converted tree must be structurally identical to the init tree
    assert (jax.tree.structure({"params": params, "batch_stats": stats})
            == jax.tree.structure(
                {"params": jax.tree.map(np.asarray, init_vars["params"]),
                 "batch_stats": jax.tree.map(
                     np.asarray, init_vars["batch_stats"])}))
    e_jax = m.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(e_jax), e_ref,
                               atol=5e-4, rtol=1e-3)


def test_converted_embeddings_match_plain(ref_blocks):
    _embed_parity(ref_blocks, use_weight_norm=False)


def test_converted_embeddings_match_weightnorm(ref_blocks):
    _embed_parity(ref_blocks, use_weight_norm=True)


def test_trainable_speaker_encoder_updates():
    """Fallback path: with train_speaker_encoder=true the speaker encoder
    joins the encoder optimizer group and moves under training."""
    from rave_tpu.config import build_config
    from rave_tpu.train.loop import init_state, make_train_step

    cfg = build_config(["v2_fork"], [
        "capacity=4", "n_signal=4096", "batch_size=2",
        "sampling_rate=16000", "valid_signal_crop=false",
        "phase_1_duration=1000", "stft_scales=[512,256]",
        "mr_stft_specs_ms=[[5,25]]", "train_speaker_encoder=true",
        "discriminator.kind=multi_scale", "discriminator.capacity=4",
        "discriminator.n_layers=2", "discriminator.member_weights=null",
    ])
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1),
                               (2, cfg.n_signal, 1)) * 0.1,
        "speaker": jnp.zeros((2,), jnp.int32),
    }
    s0 = np.asarray(
        jax.tree.leaves(state.gen_params["speaker_encoder"])[0]).copy()
    state, m = step(state, batch, jax.random.PRNGKey(2))
    s1 = np.asarray(jax.tree.leaves(state.gen_params["speaker_encoder"])[0])
    assert not np.allclose(s0, s1), \
        "speaker encoder did not update in trainable mode"
    assert np.isfinite(float(m["loss_gen_total"]))


def test_install_speaker_weights_roundtrip():
    """install_speaker_weights overwrites exactly the speaker subtree of
    a TrainState (params + batch_stats)."""
    from rave_tpu.config import build_config
    from rave_tpu.models.speaker_convert import install_speaker_weights
    from rave_tpu.train.loop import init_state

    cfg = build_config(["v2_fork"], [
        "capacity=4", "n_signal=4096", "batch_size=2",
        "sampling_rate=16000", "valid_signal_crop=false",
        "stft_scales=[512,256]", "mr_stft_specs_ms=[[5,25]]",
        "discriminator.kind=multi_scale", "discriminator.capacity=4",
        "discriminator.n_layers=2", "discriminator.member_weights=null",
    ])
    state = init_state(cfg, jax.random.PRNGKey(0))
    marked_p = jax.tree.map(lambda a: np.full(a.shape, 7.0, np.float32),
                            state.gen_params["speaker_encoder"])
    marked_s = jax.tree.map(
        lambda a: np.full(a.shape, 3.0, np.float32),
        state.model_state["batch_stats"]["speaker_encoder"])
    out = install_speaker_weights(state, marked_p, marked_s)
    assert all(np.all(np.asarray(l) == 7.0) for l in
               jax.tree.leaves(out.gen_params["speaker_encoder"]))
    assert all(np.all(np.asarray(l) == 3.0) for l in
               jax.tree.leaves(
                   out.model_state["batch_stats"]["speaker_encoder"]))
    # other groups untouched
    a = jax.tree.leaves(state.gen_params["encoder"])[0]
    b = jax.tree.leaves(out.gen_params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aam_head_margin_semantics():
    """AAMSpeakerHead: margin-free call returns scaled cosines; with
    labels the TARGET class logit is strictly reduced (cos(theta+m) <
    cos(theta)) and non-target logits are untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rave_tpu.models.speaker import AAMSpeakerHead

    head = AAMSpeakerHead(classes=4, margin=0.2, scale=30.0)
    emb = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
    params = head.init(jax.random.PRNGKey(1), emb)
    plain = np.asarray(head.apply(params, emb))
    assert plain.shape == (3, 4)
    assert np.all(np.abs(plain) <= 30.0 + 1e-4)  # scaled cosines
    labels = jnp.array([0, 1, 2])
    margined = np.asarray(head.apply(params, emb, labels))
    for i, c in enumerate([0, 1, 2]):
        assert margined[i, c] < plain[i, c]  # margin bites the target
        others = [j for j in range(4) if j != c]
        np.testing.assert_allclose(margined[i, others], plain[i, others],
                                   rtol=1e-5)


def test_from_scratch_speaker_embedding_train_eval_consistent():
    """The round-5 collapse bug: with `train_speaker_encoder=true` the
    speaker embedding must be IDENTICAL under train_mode and eval mode
    (item-norm path) -- the BatchNorm train/eval mode switch silently
    destroyed the learned separation (pre-norm batch variance ~1e-7 is
    below the BN epsilon, so the separation lived in eps-amplified
    noise that running averages re-normalized differently)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rave_tpu.config import build_config
    from rave_tpu.models.rave import RAVE

    cfg = build_config(["v2_fork"], [
        "capacity=4", "n_signal=16384", "batch_size=2",
        "valid_signal_crop=false", "train_speaker_encoder=true",
        "speaker_classes=4"])
    x = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.n_signal, 1)) * 0.1
    mt = RAVE(cfg=cfg, train_mode=True)
    me = RAVE(cfg=cfg, train_mode=False)
    rngs = {"params": jax.random.PRNGKey(1), "latent": jax.random.PRNGKey(2),
            "noise": jax.random.PRNGKey(3),
            "quantizer": jax.random.PRNGKey(4)}
    variables = mt.init(rngs, x, method=RAVE.warmup)
    # item-norm mode: no batch_stats collection at all
    assert "batch_stats" not in variables
    bands = mt.apply(variables, x, method=RAVE.pqmf_forward)
    et = mt.apply(variables, bands, method=RAVE.speaker_embedding)
    ee = me.apply(variables, bands, method=RAVE.speaker_embedding)
    np.testing.assert_allclose(np.asarray(et), np.asarray(ee),
                               atol=1e-6, rtol=1e-6)
    # the pretrained path keeps the BatchNorm layout (checkpoint compat)
    cfg2 = build_config(["v2_fork"], ["capacity=4", "n_signal=16384",
                                      "batch_size=2",
                                      "valid_signal_crop=false"])
    v2 = RAVE(cfg=cfg2, train_mode=True).init(rngs, x, method=RAVE.warmup)
    assert "attn_bn" in v2["batch_stats"]["speaker_encoder"]
