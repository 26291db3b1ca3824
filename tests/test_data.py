from pathlib import Path
"""Data pipeline: preprocess -> memmap store -> loader round trip."""
import os

import numpy as np
import pytest

from rave_tpu.data.audio_io import load_wav, save_wav
from rave_tpu.data.dataset import (AudioDataset, DataLoader, preprocess,
                                   split_dataset)


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = tmp_path_factory.mktemp("audio")
    rng = np.random.default_rng(0)
    for spk in ["spk0", "spk1"]:
        d = root / spk
        d.mkdir()
        for i in range(2):
            t = np.arange(8192 * 3) / 16000
            x = 0.4 * np.sin(2 * np.pi * (100 + 50 * i) * t)
            x += 0.01 * rng.standard_normal(len(x))
            save_wav(d / f"{i}.wav", x.astype(np.float32), 16000)
    out = tmp_path_factory.mktemp("db")
    meta = preprocess(str(root), str(out), n_signal=4096, sample_rate=16000,
                      num_workers=1)
    return out, meta


def test_wav_round_trip(tmp_path):
    x = np.clip(np.random.default_rng(1).standard_normal(1000) * 0.5,
                -1, 1).astype(np.float32)
    save_wav(tmp_path / "t.wav", x, 44100)
    y, sr = load_wav(tmp_path / "t.wav")
    assert sr == 44100
    np.testing.assert_allclose(x, y, atol=1e-4)


def test_preprocess_meta(db):
    out, meta = db
    assert meta["count"] == 4 * (8192 * 3 // 4096)
    assert meta["n_signal"] == 4096
    assert set(meta["speakers"]) == {"spk0", "spk1"}


def test_dataset_items(db):
    out, _ = db
    ds = AudioDataset(str(out), n_signal=2048)
    item = ds[0]
    assert item["x"].shape == (2048,)
    assert np.abs(item["x"]).max() <= 1.0
    assert item["speaker"] in (0, 1)


def test_normalize_and_derivative_transforms(db):
    """Reference get_dataset(normalize=..., derivative=...) options
    (rave/dataset.py:325-350) + integrator round trip."""
    out, _ = db
    ds = AudioDataset(str(out), n_signal=2048, phase_mangle_p=0.0,
                      use_dequantize=False, normalize=True, derivative=True)
    item = ds[0]
    # derivative of a normalized signal: finite, small first-difference
    assert np.isfinite(item["x"]).all()
    # the reference pair composes to a flat ~0.5 gain above the 10 Hz
    # leaky pole (H_d*H_i = 0.5*a^2*((1-z^-1)/(1-a z^-1))^2): check the
    # round trip is shape-preserving at that gain
    from rave_tpu.data.dataset import get_derivator_integrator
    der, integ = get_derivator_integrator(ds.sr)
    x = np.sin(2 * np.pi * 440 * np.arange(4096) / ds.sr).astype(np.float32)
    y = integ(der(x))
    rms = lambda s: np.sqrt(np.mean(s[512:] ** 2))
    assert abs(rms(y) / rms(x) - 0.5) < 0.05, rms(y) / rms(x)
    corr = np.corrcoef(y[512:], x[512:])[0, 1]
    assert corr > 0.99, f"round trip decorrelated: {corr}"
    # normalize: peak ~<= 1
    ds_n = AudioDataset(str(out), n_signal=2048, phase_mangle_p=0.0,
                        use_dequantize=False, normalize=True)
    assert np.abs(ds_n[0]["x"]).max() <= 1.0 + 1e-5


def test_loader_batches(db):
    out, _ = db
    ds = AudioDataset(str(out))
    train_idx, val_idx = split_dataset(len(ds))
    assert len(set(train_idx) & set(val_idx)) == 0
    dl = DataLoader(ds, batch_size=2, indices=train_idx)
    batch = next(iter(dl))
    assert batch["x"].shape == (2, 4096, 1)
    assert batch["x"].dtype == np.float32


def test_lazy_preprocess_and_dataset(tmp_path):
    """preprocess --lazy stores only {path, length} records; make_dataset
    dispatches to LazyAudioDataset (reference scripts/preprocess.py:214-225
    + rave/dataset.py:200-289)."""
    from rave_tpu.data.dataset import LazyAudioDataset, make_dataset
    root = tmp_path / "audio"
    rng = np.random.default_rng(0)
    for spk in ["spkA", "spkB"]:
        d = root / spk
        d.mkdir(parents=True)
        x = 0.3 * rng.standard_normal(4096 * 3).astype(np.float32)
        save_wav(d / "a.wav", x, 16000)
    out = tmp_path / "db"
    meta = preprocess(str(root), str(out), n_signal=4096, sample_rate=16000,
                      lazy=True)
    assert meta["format"] == "lazy_v1"
    assert meta["count"] == 2 * 3
    assert all("path" in f and "length" in f for f in meta["files"])
    assert not (out / "data.bin").exists()  # nothing was decoded to disk
    ds = make_dataset(str(out))
    assert isinstance(ds, LazyAudioDataset)
    assert len(ds) == 6
    item = ds[0]
    assert item["x"].shape == (4096,)
    assert item["speaker"] in (0, 1)
    assert ds.speaker_names == ["spkA", "spkB"]
    # loader path used by the trainer (get(i, rng))
    batch = next(iter(DataLoader(ds, 2)))
    assert batch["x"].shape == (2, 4096, 1)


def test_split_seeded_determinism():
    a1, b1 = split_dataset(100)
    a2, b2 = split_dataset(100)
    assert (a1 == a2).all() and (b1 == b2).all()


def test_perturbation_eq():
    from rave_tpu.data.perturbation import random_eq
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32) * 0.3
    y = random_eq(x, rng, sr=16000)
    assert y.shape == x.shape
    assert np.isfinite(y).all()
    assert not np.allclose(x, y)


def test_formant_shift_native():
    from rave_tpu.data.perturbation import formant_shift_native
    rng = np.random.default_rng(0)
    t = np.arange(8192) / 16000
    x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y = formant_shift_native(x, 16000, 1.2)
    assert y.shape == x.shape
    assert np.isfinite(y).all()


def test_units_provider(db):
    from rave_tpu.data.units import MelKMeansUnitProvider, precompute_units
    out, _ = db
    ds = AudioDataset(str(out))
    prov = MelKMeansUnitProvider(num_units=8, sr=16000, hop=320).fit(
        ds, max_items=8, iters=3)
    u = prov(ds[0]["x"])
    assert u.dtype == np.int32
    assert (u >= 0).all() and (u < 8).all()
    arr = precompute_units(ds, prov, str(out))
    assert arr.shape[0] == len(ds)
    # dataset picks units up (n_signal == record_len)
    ds2 = AudioDataset(str(out))
    assert "units" in ds2[0]


def test_hubert_units_provider(db, tmp_path):
    """Real-HuBERT unit path (reference teacher, rave/model.py:240-241):
    a LOCAL transformers HubertModel checkpoint -> 50 Hz features ->
    k-means units, driven through the CLI."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from rave_tpu.cli import main as cli_main

    cfg = transformers.HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16,) * 7,
        do_stable_layer_norm=False, feat_extract_norm="group")
    ckpt = tmp_path / "hubert_tiny"
    transformers.HubertModel(cfg).eval().save_pretrained(str(ckpt))

    out, _ = db
    cli_main(["units", "--db_path", str(out), "--provider", "hubert",
              "--ckpt", str(ckpt), "--num_units", "8", "--layer", "2"])
    units = np.load(out / "units.npy")
    ds = AudioDataset(str(out))
    assert units.shape[0] == len(ds)
    assert units.min() >= 0 and units.max() < 8
    # HuBERT unit rate: 50 Hz at 16 kHz -> frames ~= record_seconds * 50
    secs = ds.record_len / ds.sr
    assert abs(units.shape[1] - secs * 50) <= 2, units.shape
    # the dataset serves them to the CE path
    assert "units" in ds[0]


def test_remote_dataset_http(db):
    from rave_tpu.data.remote import HTTPAudioDataset, serve_dataset
    out, _ = db
    ds = AudioDataset(str(out))
    server = serve_dataset(ds, host="127.0.0.1", port=0)
    port = server.server_address[1]
    client = HTTPAudioDataset(f"http://127.0.0.1:{port}")
    assert len(client) == len(ds)
    item = client[0]
    assert item["x"].shape == (ds.n_signal,)
    server.shutdown()


def test_yin_f0_sine():
    from rave_tpu.data.pitch import yin_f0
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    f0 = yin_f0(x, sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > len(f0) * 0.8
    assert abs(np.median(voiced) - 220) < 5


def test_dataloader_pool_matches_serial(db):
    """Fork-pool workers produce byte-identical batches to the serial
    path (per-(seed, epoch, index) augmentation rngs)."""
    out, _ = db
    ds = AudioDataset(str(out))
    a = list(DataLoader(ds, 2, shuffle=True, seed=3, num_workers=0))
    ds2 = AudioDataset(str(out))
    b = list(DataLoader(ds2, 2, shuffle=True, seed=3, num_workers=2))
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_lazy_dataset_applies_transform_chain(tmp_path):
    """The lazy dataset applies the same augmentation chain as the record
    store (reference rave/dataset.py:258-289): phase mangle, dequantize,
    normalize, derivative."""
    from rave_tpu.data.dataset import LazyAudioDataset, make_dataset
    root = tmp_path / "audio"
    d = root / "spk"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    x = 0.01 * rng.standard_normal(4096 * 2).astype(np.float32)
    save_wav(d / "a.wav", x, 16000)
    out = tmp_path / "db"
    preprocess(str(root), str(out), n_signal=4096, sample_rate=16000,
               lazy=True)
    ds = make_dataset(str(out), normalize=True, derivative=True)
    assert isinstance(ds, LazyAudioDataset)
    assert ds.integrator is not None  # derivative mode paired inverse
    item = ds.get(0, np.random.default_rng(1))
    # normalize lifts the quiet 0.01-peak signal toward the +30 dB cap;
    # combined with phase-mangle/dequantize/derivative the item cannot
    # equal the raw chunk
    assert item["x"].shape == (4096,)
    assert not np.allclose(item["x"], x[:4096], atol=1e-4)
    # deterministic under a fixed rng
    again = ds.get(0, np.random.default_rng(1))
    assert np.array_equal(item["x"], again["x"])
    # transforms are individually disengageable like AudioDataset
    plain = LazyAudioDataset(files=[{"path": str(d / "a.wav"),
                                     "length": 8192}],
                             n_signal=4096, sr=16000, phase_mangle_p=0.0,
                             use_dequantize=False)
    it = plain.get(0, np.random.default_rng(2))
    assert np.allclose(it["x"], x[:4096], atol=1e-4)


def test_units_dropped_warning(db, tmp_path):
    """units.npy next to the store but an incompatible crop length must
    warn loudly instead of silently dropping the CE targets."""
    import warnings
    from rave_tpu.data.dataset import AudioDataset
    db_path, meta = db
    np.save(Path(db_path) / "units.npy",
            np.zeros((meta["count"], 10), np.int32))
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ds = AudioDataset(db_path, n_signal=meta["n_signal"] // 2)
        assert ds.units is None
        assert any("DROPPED" in str(x.message) for x in w)
        # full-length crop keeps them silently
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            ds2 = AudioDataset(db_path)
        assert ds2.units is not None
        assert not any("DROPPED" in str(x.message) for x in w2)
    finally:
        (Path(db_path) / "units.npy").unlink()


@pytest.mark.skipif(not os.environ.get("RAVE_TPU_HUBERT_CKPT"),
                    reason="set RAVE_TPU_HUBERT_CKPT to a local HuBERT "
                           "checkpoint to validate the real teacher path")
def test_real_hubert_units_env(db):
    """Zero-flag real-teacher validation: with $RAVE_TPU_HUBERT_CKPT the
    CLI defaults to the hubert provider and that checkpoint, and the
    extracted units behave like 50 Hz discrete units."""
    from rave_tpu.cli import main as cli_main
    out, _ = db
    cli_main(["units", "--db_path", str(out), "--num_units", "100"])
    units = np.load(out / "units.npy")
    ds = AudioDataset(str(out))
    assert units.shape[0] == len(ds)
    assert units.min() >= 0 and units.max() < 100
    secs = ds.record_len / ds.sr
    assert abs(units.shape[1] - secs * 50) <= 2, units.shape
