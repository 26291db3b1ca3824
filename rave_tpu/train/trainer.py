"""Training driver: data loading, jitted step, validation, checkpoints.

Counterpart of reference ``scripts/train.py:112-230`` / ``train_rave.py``
minus Lightning: a plain loop around the single jitted train step, with
data-parallel sharding over all local devices, metric logging (jsonl +
optional TensorBoard), EMA weights, and best/last checkpoints.

Multi-host behaviour (``--multihost``): the validation *metric*, best-
checkpoint selection and collective orbax saves are fully multi-host
(replicated scalars + every-process save); the audio demos, conversion
demo and latent-PCA fit are single-host-only and are skipped on
multi-process runs -- batch-sharded arrays spanning hosts are not fully
addressable from one process, and demos are diagnostics, not training
state.
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RAVE_TPU_CACHE",
                                 os.path.expanduser("~/.jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ..config import build_config
from ..data.dataset import DataLoader, make_dataset, split_dataset
from ..parallel.mesh import (batch_sharding, make_mesh, replicate_state,
                             replicated)
from .checkpoint import CheckpointManager, save_config
from .loop import init_state, make_eval_step, make_train_step


class MetricLogger:
    """jsonl metrics + optional TensorBoard (reference logs to TB + wandb,
    ``scripts/train.py:205-208``, ``model.py:570-589``)."""

    def __init__(self, run_dir: str):
        self.path = Path(run_dir) / "metrics.jsonl"
        self.f = open(self.path, "a")
        try:
            from torch.utils.tensorboard import SummaryWriter  # cpu torch
            self.tb = SummaryWriter(log_dir=str(Path(run_dir) / "tb"))
        except Exception:
            self.tb = None

    def log(self, step: int, metrics: dict):
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self.tb.add_scalar(k, v, step)

    def status(self, step: int, metrics: dict):
        """Atomic ``status.json`` side-channel for external monitors —
        the reference keeps an LMDB status db updated every 100 steps
        (``ProgressLogger``/``LoggerCallback``, ``core.py:502-544``)."""
        rec = {"step": step, "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        tmp = self.path.parent / "status.json.tmp"
        tmp.write_text(json.dumps(rec))
        tmp.replace(self.path.parent / "status.json")


def make_put(bs, rep, multiprocess=None):
    """Host batch -> device arrays under the mesh shardings.

    Single-process: plain ``device_put``.  Multi-host DP over DCN: each
    host contributes its local shard of the global batch via
    ``make_array_from_process_local_data`` (SURVEY §2.9; the reference
    has no multi-node path).  ``multiprocess`` is injectable so the
    multi-host branch is testable on one process."""
    multi = (jax.process_count() > 1) if multiprocess is None \
        else multiprocess

    def put(batch):
        if multi:
            return {k: jax.make_array_from_process_local_data(
                        bs if np.asarray(v).ndim else rep, np.asarray(v))
                    for k, v in batch.items()}
        return {k: jax.device_put(v, bs if v.ndim else rep)
                for k, v in batch.items()}

    return put


def ema_eval_view(cfg, state):
    """Validation (and therefore best-checkpoint selection, audio demos,
    and the conversion demo) runs on the EMA shadow weights when EMA is
    enabled -- the reference's EMA callback swaps them in around
    validation (``scripts/train.py:64-103``)."""
    if cfg.ema_decay and state.ema_params is not None:
        return state.replace(gen_params=state.ema_params)
    return state


def conversion_quality(spk_emb_fn, state, conv_pair, yc,
                       sr: int, ref_x=None) -> dict:
    """Objective voice-conversion quality of one validation demo
    (round-3 verdict #6; the reference logs audio only,
    ``model.py:713-731``):

    * ``conversion_spk_cos_target`` / ``_source``: cosine similarity of
      the converted audio's speaker embedding (through the model's own
      SpeakerRAVE) to the target / source item -- successful conversion
      drives target-cos up and source-cos down,
    * ``conversion_f0_rmse_log``: RMSE of the converted audio's voiced
      log-f0 against the target item's log-f0 median (did the pitch
      register move to the target speaker?).
    """
    src, tgt = conv_pair
    t = min(yc.shape[1], src.shape[1], tgt.shape[1])
    batch = [np.asarray(yc)[:, :t], np.asarray(src)[:, :t],
             np.asarray(tgt)[:, :t]]
    if ref_x is not None:
        # cohort embedding: from-scratch speaker encoders whiten by
        # batch statistics (models.speaker.CohortNorm), so the trio is
        # embedded JOINTLY with the validation batch -- the cohort
        # supplies the normalization statistics (speaker-verification
        # enrollment does the same; for a batch-independent pretrained
        # encoder the extra items are simply inert).  Crop to the trio
        # length so the jitted embed fn sees one shape per validation.
        batch.append(np.asarray(ref_x)[:, :t])
    e = np.asarray(spk_emb_fn(state, jnp.asarray(
        np.concatenate(batch, axis=0))))
    e = e.reshape(e.shape[0], -1)[:3]

    def cos(a, b):
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    out = {"conversion_spk_cos_target": cos(e[0], e[2]),
           "conversion_spk_cos_source": cos(e[0], e[1]),
           # source-vs-target separation of the encoder itself: the
           # ceiling on any conversion gap (if the encoder cannot tell
           # the two speakers apart, cos_target - cos_source cannot
           # move).  With the AAM-trained from-scratch encoder this
           # should fall well below 1; a VoxCeleb-pretrained one starts
           # low.
           "conversion_spk_cos_pair": cos(e[1], e[2])}
    from ..data.pitch import yin_f0
    f0c = yin_f0(np.asarray(yc)[0, :t, 0], sr)
    f0t = yin_f0(np.asarray(tgt)[0, :t, 0], sr)
    vc, vt = f0c[f0c > 0], f0t[f0t > 0]
    if len(vc) and len(vt):
        out["conversion_f0_rmse_log"] = float(np.sqrt(np.mean(
            (np.log(vc) - np.log(np.median(vt))) ** 2)))
    return out


def train_main(args) -> None:
    if getattr(args, "multihost", False):
        # multi-host data parallelism over DCN: same mesh code, the
        # device set just spans hosts (SURVEY §2.9; the reference has no
        # multi-node path).  Coordinator/host-count come from the TPU
        # runtime environment.
        jax.distributed.initialize()
    is_main = jax.process_index() == 0

    cfg = build_config(args.config or ["v2"], args.override)
    if args.batch:
        cfg.batch_size = args.batch
    if args.max_steps:
        cfg.max_steps = args.max_steps
    if getattr(args, "ema", None):
        cfg.ema_decay = args.ema

    run_dir = Path(args.out_path) / f"{args.name}_{cfg.hash()}"
    run_dir.mkdir(parents=True, exist_ok=True)
    save_config(run_dir, cfg)
    logger = MetricLogger(run_dir)

    # input perturbation: the VC fork's core mechanism -- the encoder
    # consumes a formant/pitch-shifted + EQ'd (+ noised) view while the
    # losses compare against the clean signal (reference
    # rave/dataset.py:258-289, model.py:340-343)
    want_perturb = cfg.perturb_inputs
    if getattr(args, "perturb", None) is not None:
        want_perturb = args.perturb
    perturb = noise = None
    if want_perturb:
        from ..data.perturbation import Perturb
        perturb = Perturb(cfg.sampling_rate)
    if getattr(args, "noise_path", None):
        from ..data.dataset import RandomBackgroundNoise
        noise = RandomBackgroundNoise(args.noise_path, cfg.sampling_rate,
                                      min_snr_db=14.0, max_snr_db=15.0,
                                      p=1.0)
    ds = make_dataset(args.db_path, n_signal=cfg.n_signal,
                      normalize=getattr(args, "normalize", False),
                      derivative=getattr(args, "derivative", False),
                      perturb=perturb, noise=noise)
    if perturb is not None:
        if getattr(ds, "perturbed", None) is not None:
            print(f"using {ds.perturbed.shape[1]} precomputed perturbation "
                  "variants/record (perturbed.bin)")
        elif getattr(args, "num_workers", 0) == 0:
            print("note: input perturbation is CPU-heavy (~150 ms/item); "
                  "run `rave-tpu perturb --db_path ...` once to precompute "
                  "variants, or use --num_workers 8")

    # pitch conditioning: per-speaker log-f0 stats (reference
    # global_speaker_dict from speaker_stats_fcpe.json, model.py:243-247,
    # 316-317).  Missing file -> per-utterance stats in-graph.
    f0_stats = None
    if cfg.pitch_embedding_size > 0:
        sp = Path(getattr(args, "speaker_stats", None)
                  or Path(args.db_path) / "speaker_stats.json")
        if sp.exists():
            stats = json.loads(sp.read_text())
            med = np.array([stats.get(n, {}).get("mean", np.log(160.0))
                            for n in ds.speaker_names], np.float32)
            std = np.array([max(stats.get(n, {}).get("std", 0.5), 1e-3)
                            for n in ds.speaker_names], np.float32)
            f0_stats = (med, std)
            print(f"pitch stats: {sp} ({len(stats)} speakers)")
        else:
            print("pitch stats: none found, using per-utterance stats")

    def enrich(batch):
        if f0_stats is not None and "speaker" in batch:
            sid = np.asarray(batch["speaker"])
            batch = {**batch, "f0_median": f0_stats[0][sid],
                     "f0_std": f0_stats[1][sid]}
        return batch

    train_idx, val_idx = split_dataset(len(ds))
    if len(val_idx) == 0:
        # single-record corpus: reuse a training item so validation still
        # yields a batch instead of constructing a batch-size-0 loader
        val_idx = train_idx[:1]
    if len(train_idx) < cfg.batch_size:
        raise ValueError(
            f"training split has {len(train_idx)} records < batch_size "
            f"{cfg.batch_size}: the loader would yield no batches "
            "(preprocess more audio or lower batch_size)")
    train_loader = DataLoader(ds, cfg.batch_size, train_idx, shuffle=True,
                              num_workers=getattr(args, "num_workers", 0))
    # a tiny validation split must still yield at least one batch (else
    # validation is silently NaN and best-tracking never fires), and
    # every batch must shard evenly over the device mesh: shrink the val
    # batch to a device-count multiple and repeat indices if needed
    n_dev = jax.device_count()
    if len(val_idx) < n_dev:
        val_idx = (list(val_idx) * n_dev)[:n_dev]
    val_bs = min(cfg.batch_size, (len(val_idx) // n_dev) * n_dev)
    val_loader = DataLoader(ds, val_bs, val_idx, shuffle=False)

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    state = init_state(cfg, jax.random.PRNGKey(0))
    if getattr(args, "speaker_ckpt", None):
        # pretrained VoxCeleb speaker encoder (reference model.py:165-174:
        # __S__. key rewrite + freeze); converted torch->flax once here
        from ..models.speaker_convert import (install_speaker_weights,
                                              load_speaker_checkpoint)
        if cfg.speaker_norm == "auto" and cfg.train_speaker_encoder:
            raise SystemExit(
                "train_speaker_encoder=true resolves speaker_norm=auto to "
                "LayerNorm, which cannot load a BatchNorm-layout VoxCeleb "
                "checkpoint; add --override speaker_norm=batch to "
                "fine-tune the pretrained encoder")
        sp, st = load_speaker_checkpoint(args.speaker_ckpt)
        state = install_speaker_weights(state, sp, st)
        print(f"loaded pretrained speaker encoder: {args.speaker_ckpt}")
        if cfg.train_speaker_encoder:
            print("note: train_speaker_encoder=true -- the pretrained "
                  "speaker encoder will be fine-tuned, not frozen")
    ckpt = CheckpointManager(run_dir)
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")
    state = replicate_state(state, mesh)

    # donate the batch too: its device buffers free as soon as the step
    # consumes them.  KNOWN ISSUE (round 5, measured): the tunnelled
    # (axon) client retains each transferred batch's HOST staging
    # memory regardless of buffer lifetime, donation, or gc --
    # ~payload-bytes/step (~8 MB at batch 8x131072) until the kernel
    # oom-kills a long run.  Isolated: constant device batch -> flat
    # RSS; fresh device_put per step -> linear growth even with true
    # value-fetch syncs.  Mitigation for long runs on tunnelled
    # runtimes: chunked execution with --resume (exact; see
    # docs/training_guide.md "Long runs").  Real TPU hosts (non-
    # tunnelled PJRT) do not exhibit this.
    step_fn = jax.jit(make_train_step(cfg), donate_argnums=(0, 1))
    eval_fn = jax.jit(make_eval_step(cfg))
    rng = jax.device_put(jax.random.PRNGKey(1), rep)

    convert_fn = spk_emb_fn = None
    if cfg.speaker_embedding_size > 0:
        # random-pair voice-conversion demo at validation (reference
        # validation_step logs a conversion sample, model.py:713-731)
        from ..models.rave import RAVE
        _conv_model = RAVE(cfg=cfg, train_mode=False)

        @jax.jit
        def convert_fn(state, src, tgt):
            variables = {"params": state.gen_params, **state.model_state}
            return _conv_model.apply(
                variables, src, tgt, method=RAVE.convert,
                rngs={"latent": jax.random.PRNGKey(8),
                      "noise": jax.random.PRNGKey(9),
                      "quantizer": jax.random.PRNGKey(10)})

        @jax.jit
        def spk_emb_fn(state, x):
            # speaker embedding of raw audio through the model's own
            # (frozen or trained) SpeakerRAVE -- the objective judge of
            # conversion timbre (the reference logs only audio demos;
            # this exceeds it with a measurable target-similarity)
            variables = {"params": state.gen_params, **state.model_state}
            bands = _conv_model.apply(variables, x,
                                      method=RAVE.pqmf_forward)
            return _conv_model.apply(variables, bands,
                                     method=RAVE.speaker_embedding)

    put = make_put(bs, rep)
    eval_view = partial(ema_eval_view, cfg)

    # --profile: tick-style section profiler (reference Profiler,
    # rave/model.py:32-47 / Lightning profiler="simple",
    # scripts/train.py:214) + a jax.profiler device trace of steps 10-15
    # written under <run>/profile for TensorBoard/xprof
    prof = None
    if getattr(args, "profile", False):
        from ..utils.profiler import Sections
        prof = Sections()
    from contextlib import nullcontext
    sec = (lambda name, *a: prof(name, *a)) if prof else \
        (lambda name, *a: nullcontext())

    t0 = time.time()
    window = 50
    last = t0
    done = False
    # host-side step counter (reading int(state.step) every iteration
    # would sync on the previous step's device output and serialize host
    # batch prep against device compute)
    step = int(state.step)
    while not done:
        for batch in train_loader:
            if step >= cfg.max_steps:
                done = True
                break
            if prof is not None and step == 10:
                jax.profiler.start_trace(str(run_dir / "profile"))
            with sec("put"):
                dbatch = put(enrich(batch))
            with sec("step"):
                state, metrics = step_fn(state, dbatch, rng)
            if prof is not None:
                # per-step sync so section times are true wall clock (the
                # reference's Profiler ticks are synchronous CUDA time)
                with sec("sync"):
                    jax.block_until_ready(metrics)
            if prof is not None and step == 15:
                jax.profiler.stop_trace()
                print(f"device trace: {run_dir / 'profile'}")

            if step % window == 0:
                jax.block_until_ready(metrics)
                now = time.time()
                sps = window / (now - last) if step else 0.0
                last = now
                if is_main:
                    logger.log(step, {**metrics, "steps_per_s": sps})
                    logger.status(step, {"steps_per_s": sps})
                    print(f"step {step} "
                          + " ".join(f"{k}={float(v):.4f}"
                                     for k, v in metrics.items()))
                    if prof is not None and step:
                        print(prof)

            if args.val_every and step and step % args.val_every == 0:
                vals, zs = {}, []
                demo = None
                conv_pair = None
                single = jax.process_count() == 1
                est = eval_view(state)
                for vb in val_loader:
                    m, y, z = eval_fn(est, put(enrich(vb)),
                                      jax.random.PRNGKey(2))
                    for k in m:  # validation + unit CE/accuracy streams
                        vals.setdefault(k, []).append(float(m[k]))
                    if single:
                        # batch-sharded arrays are only fully fetchable
                        # single-host; metrics are replicated scalars
                        zs.append(np.asarray(z).reshape(-1, z.shape[-1]))
                        if demo is None:
                            demo = (np.asarray(vb["x"][0, :, 0]),
                                    np.asarray(y[0, :, 0]))
                        if convert_fn is not None and conv_pair is None \
                                and "speaker" in vb:
                            # a random cross-speaker pair (reference picks
                            # two random batch items, model.py:713-720)
                            spk = np.asarray(vb["speaker"])
                            js = np.flatnonzero(spk != spk[0])
                            j = int(js[0]) if len(js) else \
                                min(1, len(spk) - 1)
                            conv_pair = (np.asarray(vb["x"][:1]),
                                         np.asarray(vb["x"][j:j + 1]))
                if demo is not None and is_main:
                    # audio demos, like the reference's TB/wandb audio
                    # logging (model.py:786-803): original + reconstruction
                    from ..data.audio_io import save_wav
                    adir = Path(run_dir) / "audio"
                    adir.mkdir(exist_ok=True)
                    orig, rec = demo
                    if ds.integrator is not None:
                        # derivative training: integrate logged audio back
                        # (reference validation_epoch_end, model.py:781-784)
                        orig, rec = ds.integrator(orig), ds.integrator(rec)
                    save_wav(str(adir / f"step{step}_original.wav"),
                             np.clip(orig, -1, 1), cfg.sampling_rate)
                    save_wav(str(adir / f"step{step}_reconstruction.wav"),
                             np.clip(rec, -1, 1), cfg.sampling_rate)
                    if convert_fn is not None and conv_pair is not None:
                        # content of item 0 in the timbre of the random
                        # other-speaker item (model.py:713-731)
                        yc_arr = np.asarray(convert_fn(est, conv_pair[0],
                                                       conv_pair[1]))
                        yc = yc_arr[0, :, 0]
                        if ds.integrator is not None:
                            yc = ds.integrator(yc)
                        save_wav(str(adir / f"step{step}_conversion.wav"),
                                 np.clip(yc, -1, 1), cfg.sampling_rate)
                        # objective conversion quality (beyond the
                        # reference's audio-only logging): does the
                        # converted audio carry the TARGET's timbre and
                        # pitch register?
                        cm = conversion_quality(
                            spk_emb_fn, est, conv_pair, yc_arr,
                            cfg.sampling_rate, ref_x=np.asarray(vb["x"]))
                        for k in cm:
                            vals.setdefault(k, []).append(cm[k])
                v = (float(np.mean(vals["validation"]))
                     if vals.get("validation") else float("nan"))
                if is_main:
                    logger.log(step, {k: float(np.mean(vs))
                                      for k, vs in vals.items() if vs})
                    if zs and cfg.latent_head == "variational":
                        from .latent_stats import (fit_latent_pca,
                                                   save_latent_stats)
                        save_latent_stats(run_dir,
                                          fit_latent_pca(np.concatenate(zs)))
                ckpt.save(state, {"validation": v})

            if args.ckpt_every and step and step % args.ckpt_every == 0:
                # orbax saves are cross-process collectives: every
                # process must enter save(), not just the main one
                ckpt.save(state)
            step += 1

    if prof is not None:
        try:  # run shorter than the trace window: close it out
            jax.profiler.stop_trace()
        except Exception:
            pass
        print(prof)
    ckpt.save(state)
    ckpt.wait()
    if is_main:
        logger.status(int(state.step), {"finished": 1.0})
    print(f"finished at step {int(state.step)} "
          f"({time.time() - t0:.0f}s)")
