"""Whole-graph streaming tests: offline model == chunked streaming model
(up to the static delay), and the realtime host machinery.

This closes the gap the reference leaves (its streaming tests only cover
individual blocks, ``tests/test_residual.py``; full-graph equivalence is
implied by nn~ behaviour only).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.config import build_config
from rave_tpu.export.streaming import StreamingRAVE
from rave_tpu.models.rave import RAVE

# small ratios/dilations keep the total streaming delay well under the
# test signal length (full v2 delay is ~18k samples -- larger than any
# cheap test signal)
TINY = ["capacity=4", "n_signal=16384", "batch_size=1",
        "ratios=[2,2]", "dilations=[[1,3],[1,3]]"]


def _rngs():
    return {"params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "quantizer": jax.random.PRNGKey(3)}


@pytest.mark.parametrize("stack", [["v2"], ["v2", "causal"], ["v1"],
                                   ["onnx"], ["raspberry"],
                                   ["v1", "causal"]],
                         ids=["v2", "v2+causal", "v1", "onnx", "raspberry",
                              "v1+causal"])
def test_full_graph_stream_equiv(stack):
    """Deterministic path: encode (mean latent) -> decode, offline vs
    chunked streaming with the same params.

    v1/onnx/raspberry cover the EncoderV1 BatchNorm semantics: eval mode
    uses frozen running stats (a per-channel affine), so streaming output
    is chunk-size invariant -- the reference's eval-mode BatchNorm1d
    (``rave/blocks.py:445,461``).  The v1 noise branch is stochastic
    filtered noise and is disabled for determinism (onnx.gin does the
    same, reference ``configs/onnx.gin``)."""
    cfg = build_config(stack, TINY + ["v1_use_noise=false"])
    off = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 16384, 1)) * 0.3
    variables = jax.jit(off.init)(_rngs(), x)
    params = variables["params"]
    aux = {k: v for k, v in variables.items()
           if k not in ("params", "cache")}

    y_off = jax.jit(lambda v, a: off.apply(
        v, a, rngs={"latent": jax.random.PRNGKey(4)}))(
        {"params": params, **aux}, x)

    sr = StreamingRAVE(cfg, params, chunk_size=2048, model_state=aux)
    y_str = sr.process_file(np.asarray(x[0, :, 0]))

    d = sr.total_delay_samples()
    a = np.asarray(y_off[0, :, 0])
    n = len(a)
    assert d < n // 2, f"delay {d} >= half signal {n}"
    # exclude the boundary-corrupted warmup region (2x delay, like the
    # block-level tests) and edges
    m = 2 * d + 256
    a_cmp, b_cmp = a[m - d: n - d - 256], y_str[m: n - 256]
    err = np.abs(a_cmp - b_cmp)
    scale = np.abs(a_cmp).mean() + 1e-9
    assert np.median(err) / scale < 0.02, \
        f"median rel err {np.median(err) / scale}"


def test_native_ring_buffer():
    from rave_tpu.export.realtime import NativeRing
    rb = NativeRing(1024)
    x = np.arange(300, dtype=np.float32)
    assert rb.write(x) == 300
    assert rb.readable() == 300
    got = rb.read(200)
    np.testing.assert_array_equal(got, x[:200])
    # wraparound
    y = np.arange(900, dtype=np.float32)
    assert rb.write(y) == 900
    got = rb.read(1000)
    np.testing.assert_array_equal(got, np.concatenate([x[200:], y]))


def test_realtime_host_passthrough():
    """Host loop with an identity 'model' moves audio through rings."""
    from rave_tpu.export.realtime import RealtimeHost

    class Identity:
        def forward(self, x):
            return x

    host = RealtimeHost(Identity(), chunk=256, ring_seconds=0.5, sr=16000)
    host.start()
    x = np.random.default_rng(0).standard_normal(1024).astype(np.float32)
    host.push(x)
    import time
    deadline = time.time() + 5
    out = []
    while sum(map(len, out)) < 1024 and time.time() < deadline:
        out.append(host.pull(128))
        time.sleep(0.002)
    host.stop()
    y = np.concatenate(out)[:1024]
    nz = np.flatnonzero(y)
    assert len(nz), "no audio passed through"
    # output equals input modulo leading zeros from pull-before-ready
    lead = nz[0]
    np.testing.assert_allclose(y[lead:], x[: 1024 - lead], atol=1e-6)


def test_discrete_indices_streaming_roundtrip():
    """RVQ-indices surface (reference DiscreteScriptedRAVE,
    export.py:503-517): audio chunk -> integer codes -> audio chunk."""
    cfg = build_config(["discrete"], TINY + [
        "capacity=4", "latent_size=8", "num_quantizers=2",
        "codebook_size=32"])
    cfg.discriminator.capacity = 4
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 16384, 1)) * 0.3
    variables = jax.jit(model.init)(_rngs(), x)
    params = variables["params"]

    sr = StreamingRAVE(cfg, params, chunk_size=2048)
    chunk = np.asarray(x[:, :2048])
    idx = sr.encode_indices(chunk)
    t_z = 2048 // cfg.total_ratio()
    assert idx.shape == (1, 2, t_z)
    assert np.issubdtype(idx.dtype, np.integer)
    assert idx.min() >= 0 and idx.max() < 32
    y = sr.decode_indices(idx)
    assert y.shape == (1, 2048, 1)
    assert np.isfinite(y).all()


def test_export_uses_trained_aux_state():
    """Exported serving must carry the TRAINED auxiliary collections
    (RVQ EMA codebooks, BatchNorm running stats) -- not a fresh init
    (the reference checkpoints these as module buffers)."""
    cfg = build_config(["discrete"], TINY + [
        "capacity=4", "latent_size=8", "num_quantizers=2",
        "codebook_size=32"])
    cfg.discriminator.capacity = 4
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 16384, 1)) * 0.3
    variables = jax.jit(model.init)(_rngs(), x)
    trained = {"quantizer": jax.tree.map(
        lambda a: jnp.full(a.shape, 0.5, a.dtype), variables["quantizer"])}
    sr = StreamingRAVE(cfg, variables["params"], chunk_size=2048,
                       model_state=trained)
    for leaf in jax.tree.leaves(sr.aux_state["quantizer"]):
        assert np.all(np.asarray(leaf) == 0.5)
    # decode path actually consumes them (codebook 0.5 everywhere ->
    # every code decodes identically)
    idx = sr.encode_indices(np.asarray(x[:, :2048]))
    y = sr.decode_indices(idx)
    assert np.isfinite(np.asarray(y)).all()


def test_fake_stereo_decode():
    """Fake stereo (reference export.py:322-337): one encoding, the z
    duplicated along batch, the two decodes become the two channels."""
    cfg = build_config(["v2"], TINY)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(12), (1, 16384, 1)) * 0.3
    variables = jax.jit(model.init)(_rngs(), x)
    params = variables["params"]

    sr = StreamingRAVE(cfg, params, chunk_size=2048, stereo=True)
    chunk = np.asarray(x[:, :2048])
    z = sr.encode(chunk)
    y = sr.decode(z)
    assert y.shape == (1, 2048, 2)
    # both channels come from identical decoders + state -> identical
    np.testing.assert_allclose(y[..., 0], y[..., 1], atol=1e-6)
    yf = sr.forward(chunk)
    assert yf.shape == (1, 2048, 2)


def test_adain_serving_controls():
    """The v3 style-transfer workflow driven through the export surface
    (reference nn~ attributes learn_source/learn_target/reset_*,
    scripts/export.py:427-479): learn target stats, learn source stats,
    then stream -- output must differ from the untouched stream and the
    state updates must stick."""
    cfg = build_config(["v2", "adain"], TINY)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(21), (1, 16384, 1)) * 0.3
    variables = jax.jit(model.init)(_rngs(), x)
    params = variables["params"]

    sr = StreamingRAVE(cfg, params, chunk_size=2048)
    assert sr.has_adain
    chunk = np.asarray(x[:, :2048])

    # vanilla stream (no learned stats -> AdaIN inactive)
    y_plain = sr.forward(chunk)

    # learn target statistics from a louder stream
    sr.reset()
    sr.set_learn_target(True)
    sr.forward(np.asarray(x[:, 2048:4096]) * 3.0)
    n_y = [np.asarray(l) for k, l in _adain_leaves(sr.adain)
           if k == "num_update_y"]
    assert all(v > 0 for v in n_y), "target stats did not accumulate"
    sr.set_learn_target(False)

    # learn source statistics
    sr.set_learn_source(True)
    sr.forward(chunk)
    sr.set_learn_source(False)

    # transfer active: same input now renormalised to the target stats
    sr.cache = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype),
                            sr.init_cache)
    y_transfer = sr.forward(chunk)
    assert np.isfinite(y_transfer).all()
    assert not np.allclose(y_transfer, y_plain, atol=1e-5), \
        "AdaIN transfer had no effect"

    # reset_target clears the accumulated stats
    sr.reset_target()
    n_y = [np.asarray(l) for k, l in _adain_leaves(sr.adain)
           if k == "num_update_y"]
    assert all(v == 0 for v in n_y)

    # exported artifacts carry the adain state in the step signature
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        out = sr.serialize(td)
        import json as _json
        assert _json.loads((out / "meta.json").read_text())["adain"]


def _adain_leaves(tree, prefix=""):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _adain_leaves(v, prefix + k + ".")
        else:
            out.append((k, v))
    return out


def test_stereo_rejects_adain():
    cfg = build_config(["v2", "adain"], TINY)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(13), (1, 16384, 1)) * 0.3
    variables = jax.jit(model.init)(_rngs(), x)
    with pytest.raises(ValueError):
        StreamingRAVE(cfg, variables["params"], chunk_size=2048, stereo=True)


def test_streaming_with_host_resampler():
    """Host-rate adaptation (reference export resampler path,
    export.py:377-378,404-408): 2x host rate in and out."""
    cfg = build_config(["v2"], TINY)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 16384, 1)) * 0.3
    variables = jax.jit(model.init)(_rngs(), x)

    sr = StreamingRAVE(cfg, variables["params"], chunk_size=2048,
                       target_sr=2 * cfg.sampling_rate)
    assert sr.host_chunk == 4096
    chunk = np.asarray(x[:, :4096])
    y = sr.forward(chunk)
    assert y.shape == (1, 4096, 1)          # back at the host rate
    z = sr.encode(chunk)
    assert z.shape[1] == 2048 // cfg.total_ratio()
    yd = sr.decode(z)
    assert yd.shape == (1, 4096, 1)


def test_process_file_scan_matches_loop():
    """The lax.scan throughput path == the per-chunk dispatch loop."""
    cfg = build_config(["v2"], TINY)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(15), (16384,)) * 0.3
    variables = jax.jit(model.init)(_rngs(),
                                    jnp.asarray(x)[None, :, None])
    sr = StreamingRAVE(cfg, variables["params"], chunk_size=2048)
    y_loop = sr.process_file(np.asarray(x))
    y_scan = sr.process_file_scan(np.asarray(x))
    np.testing.assert_allclose(y_loop, y_scan, rtol=1e-4, atol=1e-5)


def test_pjrt_host_artifacts(tmp_path):
    """The export dir must carry everything the C++ PJRT host needs
    (native/pjrt_host.cpp): raw StableHLO, IO manifest, flat cache image
    whose size equals the manifest's cache input bytes."""
    cfg = build_config(["v2"], TINY)
    off = RAVE(cfg=cfg, train_mode=False)
    x = jnp.zeros((1, 16384, 1), jnp.float32)
    variables = jax.jit(off.init)(_rngs(), x)
    sr = StreamingRAVE(cfg, variables["params"], chunk_size=2048)
    out = sr.serialize(str(tmp_path / "export"))

    for f in ["forward.mlir", "io_manifest.txt", "cache_init.bin",
              "compile_options.pb", "forward.stablehlo", "meta.json"]:
        assert (out / f).exists(), f

    lines = (out / "io_manifest.txt").read_text().strip().splitlines()
    assert lines[0].startswith("meta 2048 ")
    ins = [l.split() for l in lines if l.startswith("in ")]
    outs = [l.split() for l in lines if l.startswith("out ")]
    assert len(outs) == len(ins), "y replaces x; cache counts must match"
    # last input is the audio chunk (1, 2048, 1) f32
    assert ins[-1][1] == "float32" and ins[-1][2] == str(2048 * 4)
    cache_bytes = sum(int(l[2]) for l in ins[:-1])
    assert (out / "cache_init.bin").stat().st_size == cache_bytes
    mlir = (out / "forward.mlir").read_bytes()
    # MLIR bytecode magic is "ML\xefR"; textual fallback starts with module
    assert mlir[:4] == b"ML\xefR" or b"module" in mlir[:4096]


def test_voice_conversion_export_roundtrip(tmp_path):
    """The myforward conversion step exports to StableHLO and the
    deserialised artifact reproduces the live jitted step (the C++ host
    serves this artifact; reference nn~ myforward, export.py:343-413)."""
    from jax import export as jexport
    from rave_tpu.export.voice_conversion import VoiceConverter

    cfg = build_config(["v2_fork", "pitch"], TINY)
    off = RAVE(cfg=cfg, train_mode=False)
    x0 = jnp.zeros((1, 16384, 1), jnp.float32)
    variables = jax.jit(off.init)(_rngs(), x0)
    table = np.random.default_rng(0).normal(
        size=(3, cfg.speaker_embedding_size)).astype(np.float32)
    vc = VoiceConverter(cfg, variables["params"], chunk_size=2048,
                        speaker_table=table)
    out = vc.serialize(str(tmp_path / "export"))

    for f in ["convert.stablehlo", "convert.mlir", "spk_embed.stablehlo",
              "convert_manifest.txt", "convert_cache_init.bin",
              "convert_meta.json", "speaker_table.npy"]:
        assert (out / f).exists(), f

    exp = jexport.deserialize((out / "convert.stablehlo").read_bytes())
    cache = jax.tree.map(jnp.zeros_like, vc.init_cache)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 2048, 1)).astype(np.float32) * 0.1)
    emb = jnp.asarray(table[1])
    feat = jnp.zeros((1, 2048 // cfg.total_ratio(),
                      cfg.pitch_embedding_size), jnp.float32)
    y_art, cache_art = exp.call(cache, x, emb, feat)
    y_live, cache_live = vc._fwd(
        jax.tree.map(jnp.zeros_like, vc.init_cache), x, emb, feat)
    np.testing.assert_allclose(np.asarray(y_art), np.asarray(y_live),
                               rtol=1e-4, atol=1e-5)

    # self-contained in-graph-pitch variant: runs from zero state and
    # agrees with the host-side pitch path on an all-unvoiced block
    # (zero feature either way)
    for f in ["convert_pg.stablehlo", "convert_pg.mlir",
              "convert_pg_manifest.txt", "convert_pg_cache_init.bin"]:
        assert (out / f).exists(), f
    exp_pg = jexport.deserialize((out / "convert_pg.stablehlo").read_bytes())
    tail = jnp.zeros((1, vc._f0_frame - vc._f0_hop), jnp.float32)
    carry = {"cache": jax.tree.map(jnp.zeros_like, vc.init_cache),
             "f0_tail": tail}
    y_pg, carry2 = exp_pg.call(carry, jnp.zeros_like(x), emb)
    y_z, _ = vc._fwd(jax.tree.map(jnp.zeros_like, vc.init_cache),
                     jnp.zeros_like(x), emb, jnp.zeros_like(feat))
    np.testing.assert_allclose(np.asarray(y_pg), np.asarray(y_z),
                               rtol=1e-4, atol=1e-5)


# consistent tiny hybrid: mel_hop * prod(encoder_ratios) must equal
# n_band * prod(ratios) (config.py rate invariant)
HYBRID_TINY = ["capacity=4", "n_signal=16384", "batch_size=1",
               "ratios=[2,2]", "dilations=[[1,3],[1,3]]",
               "mel_n_fft=512", "mel_hop=16", "encoder_ratios=[2,2]",
               "encoder_dilations=[[1],[1]]"]


def test_mel_frontend_stream_equals_offline():
    """The carried-context mel front end: chunked streaming frames ==
    offline frames shifted by mel_front_delay (exact, away from the
    reflect-padded clip head).  The REFERENCE cannot do this at all
    (cached_conv does not cache the Spectrogram, rave/blocks.py:591-596);
    round <=3 rejected hybrid streaming -- now it streams."""
    from rave_tpu.models.blocks import MelFrontEnd, mel_front_delay
    from rave_tpu.ops.conv import StreamSetup

    n_fft, hop, n_mels, sr = 512, 16, 32, 16000
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (1, 8192))) * 0.3

    off = MelFrontEnd(n_fft=n_fft, hop=hop, n_mels=n_mels, sample_rate=sr)
    v = off.init(jax.random.PRNGKey(1), jnp.asarray(x))
    m_off = np.asarray(off.apply(v, jnp.asarray(x)))

    st = MelFrontEnd(n_fft=n_fft, hop=hop, n_mels=n_mels, sample_rate=sr,
                     ss=StreamSetup(streaming=True))
    chunk = 1024
    vs = st.init(jax.random.PRNGKey(1), jnp.asarray(x[:, :chunk]))
    cache = vs.get("cache", {})
    outs = []
    for c0 in range(0, x.shape[1], chunk):
        m, upd = st.apply({"cache": cache}, jnp.asarray(x[:, c0:c0 + chunk]),
                          mutable=["cache"])
        cache = upd["cache"]
        outs.append(np.asarray(m))
    m_str = np.concatenate(outs, axis=1)

    D = mel_front_delay(n_fft, hop)
    assert D == (n_fft - n_fft // 2) // hop - 1
    # offline frame k == streaming frame k + D, for k past the
    # reflect-vs-zero clip head (ceil((n_fft//2)/hop) frames)
    head = -(-(n_fft // 2) // hop)
    a = m_off[:, head: m_str.shape[1] - D]
    b = m_str[:, head + D:]
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_full_graph_stream_equiv_hybrid():
    """Whole-graph hybrid streaming (mel front end + GRU decoder) ==
    offline, interior region.  Wider margin than the PQMF matrix: the
    clip head differs (offline reflect-pads the first n_fft//2 samples
    into the STFT; streaming starts from the zero cache every conv
    assumes) and the GRU state difference decays rather than cutting off
    at a receptive-field boundary."""
    cfg = build_config(["hybrid"], HYBRID_TINY)
    assert cfg.use_mel_encoder
    off = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 16384, 1)) * 0.3
    variables = jax.jit(off.init)(_rngs(), x)
    params = variables["params"]
    aux = {k: v for k, v in variables.items()
           if k not in ("params", "cache")}

    y_off = jax.jit(lambda v, a: off.apply(
        v, a, rngs={"latent": jax.random.PRNGKey(4)}))(
        {"params": params, **aux}, x)

    sr = StreamingRAVE(cfg, params, chunk_size=2048, model_state=aux)
    y_str = sr.process_file(np.asarray(x[0, :, 0]))

    d = sr.total_delay_samples()
    a = np.asarray(y_off[0, :, 0])
    n = len(a)
    assert d < n // 2, f"delay {d} >= half signal {n}"
    m = 2 * d + cfg.mel_n_fft + 4096  # head effects + GRU decay
    a_cmp, b_cmp = a[m - d: n - d - 256], y_str[m: n - 256]
    err = np.abs(a_cmp - b_cmp)
    scale = np.abs(a_cmp).mean() + 1e-9
    assert np.median(err) / scale < 0.02, \
        f"median rel err {np.median(err) / scale}"


