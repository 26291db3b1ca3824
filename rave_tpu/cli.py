"""``rave-tpu`` console dispatcher.

Mirrors the reference CLI surface (``scripts/main_cli.py:19-48``:
``rave {preprocess,train,export,export_onnx,remote_dataset}``) with
argparse subcommands.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    p = argparse.ArgumentParser("rave-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("preprocess", help="build a dataset from audio files")
    pp.add_argument("--input_path", required=True)
    pp.add_argument("--output_path", required=True)
    pp.add_argument("--num_signal", type=int, default=131072)
    pp.add_argument("--sampling_rate", type=int, default=44100)
    pp.add_argument("--num_workers", type=int, default=8)
    pp.add_argument("--lazy", action="store_true",
                    help="store only {path, length}; items decode on "
                         "demand (reference preprocess --lazy)")
    pp.add_argument("--perturb_variants", type=int, default=0,
                    help="precompute N perturbed views per record "
                         "(EQ + formant/pitch shift) so few-core hosts "
                         "can feed the fork's TPU step at device speed; "
                         "train-time sampling picks one and applies only "
                         "cheap noise augmentation. Also available "
                         "standalone: `rave-tpu perturb`")

    pv = sub.add_parser("perturb", help="precompute perturbation variants "
                                        "for an existing dataset")
    pv.add_argument("--db_path", required=True)
    pv.add_argument("--variants", type=int, default=8)
    pv.add_argument("--num_workers", type=int, default=0,
                    help="0 = all cores")

    tr = sub.add_parser("train", help="train a model")
    tr.add_argument("--config", action="append", default=[],
                    help="config preset(s), composed in order (like the "
                         "reference's multi --config gin flags)")
    tr.add_argument("--override", action="append", default=[],
                    help="key=value config overrides")
    tr.add_argument("--db_path", required=True)
    tr.add_argument("--name", default="run")
    tr.add_argument("--out_path", default="runs")
    tr.add_argument("--max_steps", type=int, default=None)
    tr.add_argument("--val_every", type=int, default=10000)
    tr.add_argument("--ckpt_every", type=int, default=10000)
    tr.add_argument("--batch", type=int, default=None)
    tr.add_argument("--ema", type=float, default=None)
    tr.add_argument("--resume", action="store_true")
    tr.add_argument("--num_workers", type=int, default=0,
                    help="fork-pool data workers (reference uses 8)")
    tr.add_argument("--multihost", action="store_true",
                    help="jax.distributed multi-host data parallelism")
    tr.add_argument("--normalize", action="store_true",
                    help="peak-normalise items (reference get_dataset "
                         "normalize option)")
    tr.add_argument("--derivative", action="store_true",
                    help="train on the signal derivative; demos are "
                         "integrated back (reference get_dataset derivative)")
    tr.add_argument("--speaker_stats", default=None,
                    help="per-speaker f0 stats json (from `rave-tpu "
                         "speaker_stats`) for pitch conditioning; default "
                         "<db_path>/speaker_stats.json")
    prt = tr.add_mutually_exclusive_group()
    prt.add_argument("--perturb", action="store_true", default=None,
                     help="perturb the encoder input (formant/pitch shift "
                          "+ EQ); default follows the config "
                          "(v2_fork enables it)")
    prt.add_argument("--no_perturb", dest="perturb", action="store_false",
                     help="disable input perturbation even if the config "
                          "enables it")
    tr.add_argument("--noise_path", default=None,
                    help="pre-decoded noise corpus dir (from `rave-tpu "
                         "decode_noise`) mixed into the perturbed view at "
                         "14-15 dB SNR (reference rave/dataset.py:233-238)")
    tr.add_argument("--profile", action="store_true",
                    help="tick-style section profiler (reference "
                         "rave/model.py:32-47) + a jax.profiler device "
                         "trace of steps 10-15 under <run>/profile")
    tr.add_argument("--speaker_ckpt", default=None,
                    help="pretrained torch speaker-encoder checkpoint "
                         "(VoxCeleb ECAPA, __S__.-prefixed keys; reference "
                         "model.py:165-174) converted at startup; without "
                         "it use --override train_speaker_encoder=true to "
                         "train the speaker encoder instead of freezing "
                         "random weights")

    ex = sub.add_parser("export", help="export a streaming model")
    ex.add_argument("--run", required=True)
    ex.add_argument("--streaming", action="store_true", default=True)
    ex.add_argument("--chunk_size", type=int, default=2048)
    ex.add_argument("--stereo", action="store_true",
                    help="fake stereo: one encoding, dual decoding")
    ex.add_argument("--target_sr", type=int, default=None,
                    help="host sample rate (integer multiple of the "
                         "model rate); adds streaming resampler stages")
    ex.add_argument("--best", action="store_true",
                    help="export the best-validation checkpoint instead "
                         "of the latest")
    ex.add_argument("--voice_conversion", action="store_true",
                    help="also export the myforward conversion step "
                         "(speaker-conditioned models)")
    ex.add_argument("--speaker_wavs", nargs="*", default=[],
                    help="target-speaker wavs whose embeddings become the "
                         "exported speaker table (reference export.py:75-97)")

    ev = sub.add_parser("eval", help="speaker-embedding t-SNE evaluation "
                                     "(reference train_rave.py --eval)")
    ev.add_argument("--run", required=True)
    ev.add_argument("--db_path", required=True)
    ev.add_argument("--max_items", type=int, default=512)

    st = sub.add_parser("speaker_stats", help="per-speaker f0 statistics")
    st.add_argument("--db_path", required=True)
    st.add_argument("--pitch_ckpt",
                    default=os.environ.get("RAVE_TPU_FCPE_CKPT", ""),
                    help="torchfcpe checkpoint: compute stats with the "
                         "converted FCPE neural estimator (the reference's "
                         "speaker_stats_fcpe.json recipe); defaults to "
                         "$RAVE_TPU_FCPE_CKPT, else YIN")
    st.add_argument("--out", default=None,
                    help="output json; default <db_path>/"
                         "speaker_stats.json (where train looks)")

    un = sub.add_parser("units", help="precompute discrete-unit CE targets")
    un.add_argument("--db_path", required=True)
    un.add_argument("--num_units", type=int, default=100)
    un.add_argument("--provider", choices=["mel", "hubert"],
                    default=("hubert"
                             if os.environ.get("RAVE_TPU_HUBERT_CKPT")
                             else "mel"),
                    help="mel: self-contained log-mel k-means stand-in; "
                         "hubert: features from a LOCAL HuBERT checkpoint "
                         "(reference teacher, rave/model.py:240-241). "
                         "Defaults to hubert when $RAVE_TPU_HUBERT_CKPT "
                         "is set")
    un.add_argument("--ckpt",
                    default=os.environ.get("RAVE_TPU_HUBERT_CKPT"),
                    help="hubert provider: transformers HubertModel dir "
                         "or TorchScript feature extractor; a kmeans.npy "
                         "beside it is used as the unit codebook "
                         "(default $RAVE_TPU_HUBERT_CKPT)")
    un.add_argument("--layer", type=int, default=7,
                    help="hubert provider: transformer layer to quantize "
                         "(bshall/hubert-discrete uses layer 7)")

    dn = sub.add_parser("decode_noise", help="pre-decode a noise corpus")
    dn.add_argument("--input_path", required=True)
    dn.add_argument("--output_path", required=True)
    dn.add_argument("--sampling_rate", type=int, default=44100)

    va = sub.add_parser(
        "validate_assets",
        help="validate the frozen-teacher assets (FCPE / HuBERT / speaker "
             "checkpoints) against this repo's native implementations and "
             "write docs/assets_validation.md")
    va.add_argument("--fcpe_ckpt", default=None,
                    help="torchfcpe checkpoint (default $RAVE_TPU_FCPE_CKPT)")
    va.add_argument("--hubert_ckpt", default=None,
                    help="local HuBERT checkpoint dir or TorchScript file "
                         "(default $RAVE_TPU_HUBERT_CKPT)")
    va.add_argument("--speaker_ckpt", default=None,
                    help="VoxCeleb ECAPA speaker checkpoint (__S__. layout)")
    va.add_argument("--db_path", default=None,
                    help="preprocessed dataset for the mel-vs-HuBERT "
                         "unit-stats comparison")
    va.add_argument("--out", default=None,
                    help="report path (default docs/assets_validation.md)")

    rd = sub.add_parser("remote_dataset",
                        help="serve a preprocessed dataset over HTTP "
                             "(reference scripts/remote_dataset.py)")
    rd.add_argument("--db_path", required=True)
    rd.add_argument("--host", default="0.0.0.0")
    rd.add_argument("--port", type=int, default=8080)

    args = p.parse_args(argv)

    if args.command == "preprocess":
        from .data.dataset import preprocess
        if args.perturb_variants and args.lazy:
            # reject BEFORE the (potentially long) preprocess runs
            raise SystemExit("--perturb_variants needs a record-store db "
                             "(drop --lazy)")
        meta = preprocess(args.input_path, args.output_path,
                          n_signal=args.num_signal,
                          sample_rate=args.sampling_rate,
                          num_workers=args.num_workers,
                          lazy=args.lazy)
        print(meta)
        if args.perturb_variants:
            from .data.dataset import precompute_perturbed
            path = precompute_perturbed(args.output_path,
                                        args.perturb_variants,
                                        num_workers=args.num_workers)
            print(f"wrote {args.perturb_variants} perturbed variants/record "
                  f"to {path}")
    elif args.command == "perturb":
        from .data.dataset import precompute_perturbed
        path = precompute_perturbed(args.db_path, args.variants,
                                    num_workers=args.num_workers)
        print(f"wrote {args.variants} perturbed variants/record to {path}")
    elif args.command == "train":
        from .train.trainer import train_main
        train_main(args)
    elif args.command == "export":
        from .export.streaming import export_main
        export_main(args)
    elif args.command == "eval":
        from .train.eval_viz import eval_main
        eval_main(args)
    elif args.command == "speaker_stats":
        import json
        from .data.dataset import AudioDataset
        from .data.pitch import compute_speaker_stats
        ds = AudioDataset(args.db_path)
        out = args.out or str(Path(args.db_path) / "speaker_stats.json")
        stats = compute_speaker_stats(
            ds, out, pitch_ckpt=getattr(args, "pitch_ckpt", ""))
        print(json.dumps(stats, indent=2))
    elif args.command == "units":
        from .data.dataset import AudioDataset
        from .data.units import (MelKMeansUnitProvider,
                                 TorchHubertUnitProvider, precompute_units)
        ds = AudioDataset(args.db_path)
        if args.provider == "hubert":
            if not args.ckpt:
                raise SystemExit("--provider hubert needs --ckpt "
                                 "(local HuBERT checkpoint; no network)")
            prov = TorchHubertUnitProvider(args.ckpt, sr=ds.sr,
                                           layer=args.layer,
                                           num_units=args.num_units)
            if prov.codebook is None:
                prov.fit(ds)
        else:
            prov = MelKMeansUnitProvider(num_units=args.num_units,
                                         sr=ds.sr).fit(ds)
        prov.save(str(Path(args.db_path) / "unit_codebook.npy"))
        arr = precompute_units(ds, prov, args.db_path)
        print(f"wrote units {arr.shape} to {args.db_path}/units.npy "
              f"({args.provider})")
        from .data.units import unit_stats
        import json as _json
        stats = unit_stats(arr, args.num_units)
        print("unit stats (compare providers to quantify the mel "
              "stand-in vs real HuBERT): " + _json.dumps(stats))
    elif args.command == "validate_assets":
        from .utils.assets import validate_assets_main
        validate_assets_main(args)
    elif args.command == "decode_noise":
        from .data.noise_corpus import decode_noise_corpus
        res = decode_noise_corpus(args.input_path, args.output_path,
                                  args.sampling_rate)
        print(f"decoded {len(res)} noise files")
    elif args.command == "remote_dataset":
        from .data.dataset import AudioDataset
        from .data.remote import serve_dataset
        ds = AudioDataset(args.db_path)
        server = serve_dataset(ds, host=args.host, port=args.port)
        print(f"serving {len(ds)} items on {args.host}:{args.port} "
              "(ctrl-c to stop)")
        try:
            import time
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            server.shutdown()


if __name__ == "__main__":
    main()
