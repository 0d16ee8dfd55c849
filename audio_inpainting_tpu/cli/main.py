"""CLI entry points — the reference's ``python mainN_*.py`` reproduction
recipe (README.md:81-134) as one structured command.

  python -m audio_inpainting_tpu part0|part1|part2|all [options]
  python -m audio_inpainting_tpu demo  [--assets-dir ...]
  python -m audio_inpainting_tpu check [--assets-dir ...]   # asset contract
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _add_common(p):
    p.add_argument("--input", default="vocals_accompaniment_10s.wav",
                   help="source clip (the reference's 10 s WAV)")
    p.add_argument("--assets-dir", default="demo_assets")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true", help="print metrics as JSON")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="audio_inpainting_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p0 = sub.add_parser("part0", help="0.05 s segment: GP, AR, AR+texture, NMF")
    _add_common(p0)
    p0.add_argument("--gp-restarts", type=int, default=5)
    p0.add_argument("--gp-steps", type=int, default=20)

    p1 = sub.add_parser("part1", help="random dropouts: linear, AR, NMF, U-Net")
    _add_common(p1)
    p1.add_argument("--unet-epochs", type=int, default=400)

    p2 = sub.add_parser("part2", help="2 s hole: linear, AR, NMF, GAN, diffusion")
    _add_common(p2)
    p2.add_argument("--gan-epochs", type=int, default=1500)
    p2.add_argument("--diffusion-steps", type=int, default=1500)
    p2.add_argument("--diffusion-checkpoint", default=None,
                    help="orbax dir from a corpus DDPM pretrain; skips "
                         "per-clip diffusion training (default: the "
                         "committed checkpoints/diffusion_prior when "
                         "present; pass 'none' to force per-clip)")

    pa = sub.add_parser("all", help="run all three scenario pipelines")
    _add_common(pa)
    pa.add_argument("--gp-restarts", type=int, default=5)
    pa.add_argument("--gp-steps", type=int, default=20)
    pa.add_argument("--unet-epochs", type=int, default=400)
    pa.add_argument("--gan-epochs", type=int, default=1500)
    pa.add_argument("--diffusion-steps", type=int, default=1500)
    pa.add_argument("--diffusion-checkpoint", default=None,
                    help="orbax dir from a corpus DDPM pretrain; skips "
                         "per-clip diffusion training (default: the "
                         "committed checkpoints/diffusion_prior when "
                         "present; pass 'none' to force per-clip)")

    pr = sub.add_parser("restore", help="restore one WAV with any method")
    pr.add_argument("input_wav")
    pr.add_argument("output_wav")
    pr.add_argument("--method", default="ar",
                    choices=["linear", "ar", "nmf", "gp", "unet", "gan",
                             "diffusion"])
    pr.add_argument("--threshold", type=float, default=1e-4,
                    help="damage-detection amplitude threshold; note that "
                         "naturally quiet passages below it are treated as "
                         "damage and rewritten (reference semantics)")
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--original", default=None,
                    help="clean reference WAV (GAN method only)")
    pr.add_argument("--window-s", type=float, default=None,
                    help="windowed long-clip mode: restore only fixed "
                         "windows of this many seconds around the detected "
                         "damage (O(damage) work, one compiled program per "
                         "window size; clean audio passes through exactly)")

    ps = sub.add_parser("serve", help="batch-restore a directory of WAVs "
                                      "(per-clip nets, clips over dp mesh)")
    ps.add_argument("input_dir")
    ps.add_argument("output_dir")
    ps.add_argument("--method", default="unet",
                    choices=["unet", "gan", "linear", "ar", "nmf", "gp",
                             "diffusion"],
                    help="unet/gan train all clips batched on the mesh; "
                         "the rest run the per-clip facade")
    ps.add_argument("--epochs", type=int, default=400)
    ps.add_argument("--originals", default=None,
                    help="dir of clean WAVs, same names (GAN method only)")
    ps.add_argument("--devices", type=int, default=1,
                    help="dp mesh size (clips padded to a multiple)")
    ps.add_argument("--seed", type=int, default=0)
    ps.add_argument("--window-s", type=float, default=None,
                    help="long-file mode: per clip, restore only fixed "
                         "windows around the detected damage (unet windows "
                         "batch over the dp mesh)")
    ps.add_argument("--json", action="store_true")

    pst = sub.add_parser("stream", help="restore a raw little-endian float32 "
                                        "mono PCM stream, stdin -> stdout "
                                        "(bounded latency, O(damage) work)")
    pst.add_argument("--sr", type=int, required=True,
                     help="sample rate of the incoming PCM")
    pst.add_argument("--method", default="linear",
                     choices=["linear", "ar", "nmf", "gp", "unet"],
                     help="per-window restore method (gan/diffusion need "
                          "clean references/checkpoints - not streamable)")
    pst.add_argument("--window-s", type=float, default=None,
                     help="restore window seconds (default: per-method "
                          "latency-tuned — linear/gp 0.5, ar/unet 2, "
                          "else 10)")
    pst.add_argument("--adapt-epochs", type=int, default=100,
                     help="unet: warm-window adaptation budget of the "
                          "per-stream persistent net (first window trains "
                          "the full --epochs budget)")
    pst.add_argument("--fresh-net", action="store_true",
                     help="unet: train a fresh net per window instead of "
                          "carrying one net per stream (slower, the "
                          "round-4 behavior)")
    pst.add_argument("--epochs", type=int, default=None,
                     help="unet: cold-window training epochs (default 400)")
    pst.add_argument("--chunk", type=int, default=65536,
                     help="samples per stdin read")
    pst.add_argument("--margin", type=int, default=50)
    pst.add_argument("--threshold", type=float, default=1e-4)
    pst.add_argument("--seed", type=int, default=0)
    pst.add_argument("--warmup", action="store_true",
                     help="precompile every window program BEFORE reading "
                          "stdin (StreamRestorer.warmup) so the first gap "
                          "never stalls the live stream on an XLA compile")
    pst.add_argument("--max-gap-s", type=float, default=None,
                     help="longest expected damage span, bounds --warmup's "
                          "program set (default: everything up to the "
                          "window cap)")

    psc = sub.add_parser("score", help="SNR/LSD of restored WAVs vs originals")
    psc.add_argument("restored_dir")
    psc.add_argument("originals_dir")
    psc.add_argument("--json", action="store_true")

    pu = sub.add_parser("unet-gap", help="main5_UNet_gap overfit demo variant")
    _add_common(pu)
    pu.add_argument("--epochs", type=int, default=600)

    pd = sub.add_parser("demo", help="launch the demo UI over the assets")
    pd.add_argument("--assets-dir", default="demo_assets")
    pd.add_argument("--share", action="store_true")

    pc = sub.add_parser("check", help="verify the demo asset contract")
    pc.add_argument("--assets-dir", default="demo_assets")
    return ap


def _emit(name: str, results: dict, as_json: bool):
    if as_json:
        print(json.dumps({name: results}))
        return
    print(f"== {name} ==")
    for method, vals in results.items():
        if isinstance(vals, dict):
            row = "  ".join(f"{k}={v:.2f}" if isinstance(v, float) else f"{k}={v}"
                            for k, v in vals.items())
            print(f"  {method:12s} {row}")
        else:
            print(f"  {method:12s} {vals}")


def main(argv=None) -> int:
    # Honor JAX_PLATFORMS even when a site hook already imported jax (some
    # images register a PJRT plugin from sitecustomize at interpreter start,
    # and env-based platform selection is silently pinned by then). A config
    # update before any computation re-asserts the documented env contract;
    # in a vanilla environment it is a no-op.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    args = build_parser().parse_args(argv)

    if args.cmd in ("stream", "serve") or (
            args.cmd == "restore" and args.window_s is not None):
        # serving processes re-load their window programs from the
        # persistent compile cache across restarts instead of re-paying
        # the cold compile bill (VERDICT r4 #2; no-op on CPU backends)
        from ..utils.compilecache import enable_persistent_cache

        enable_persistent_cache()

    if args.cmd == "check":
        from ..pipelines.registry import ASSET_REGISTRY

        missing = []
        for part, methods in ASSET_REGISTRY.items():
            for method, kinds in methods.items():
                for kind, rel in kinds.items():
                    path = os.path.join(args.assets_dir, rel)
                    if not os.path.exists(path):
                        missing.append(path)
        if missing:
            print(f"MISSING {len(missing)} artifacts:")
            for m in missing:
                print(" ", m)
            return 1
        print("asset contract complete")
        return 0

    if args.cmd == "demo":
        from ..demo.app import launch

        launch(args.assets_dir, share=args.share)
        return 0

    t_start = time.time()
    if args.cmd == "restore":
        from ..api import restore as api_restore
        from ..io import load_mono_normalized, save_wav_int16

        sr, damaged = load_mono_normalized(args.input_wav)
        original = None
        if args.original:
            _, original = load_mono_normalized(args.original)
        if args.window_s is not None:
            from ..methods.windowed import restore_windowed

            out = restore_windowed(damaged, sr, method=args.method,
                                   window_s=args.window_s,
                                   threshold=args.threshold, seed=args.seed,
                                   original=original)
        else:
            out = api_restore(damaged, sr, method=args.method,
                              threshold=args.threshold, seed=args.seed,
                              original=original)
        save_wav_int16(out, sr, args.output_wav)
        print(f"restored {args.input_wav} -> {args.output_wav} "
              f"({args.method}, {time.time() - t_start:.1f}s)")
        return 0
    if args.cmd == "stream":
        import numpy as np

        from ..methods.streaming import StreamRestorer

        kw = {}
        if args.method == "unet":
            kw["persist"] = not args.fresh_net
            kw["adapt_epochs"] = args.adapt_epochs
            if args.epochs is not None:
                kw["epochs"] = args.epochs
        rest = StreamRestorer(args.sr, method=args.method,
                              window_s=args.window_s, margin=args.margin,
                              threshold=args.threshold, seed=args.seed, **kw)
        if args.warmup:
            t0 = time.time()
            n_warm = rest.warmup(args.max_gap_s)
            print(f"warmup: {n_warm} window programs in "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
        stdin, stdout = sys.stdin.buffer, sys.stdout.buffer
        carry = b""   # pipe reads can split a sample's 4 bytes
        total_in = total_out = 0
        while True:
            buf = stdin.read(args.chunk * 4)
            if not buf:
                break
            carry += buf
            usable = len(carry) - len(carry) % 4
            if not usable:
                continue
            x = np.frombuffer(carry[:usable], "<f4")
            carry = carry[usable:]
            total_in += len(x)
            out = rest.feed(x)
            if len(out):
                total_out += len(out)
                stdout.write(np.asarray(out, "<f4").tobytes())
                stdout.flush()
        if carry:
            print(f"warning: {len(carry)} trailing bytes are not a whole "
                  "float32 sample; dropped", file=sys.stderr)
        out = rest.flush()
        if len(out):
            total_out += len(out)
            stdout.write(np.asarray(out, "<f4").tobytes())
            stdout.flush()
        print(f"streamed {total_in} samples in, {total_out} out "
              f"({args.method}, {time.time() - t_start:.1f}s)",
              file=sys.stderr)
        return 0
    if args.cmd == "score":
        import glob

        import numpy as np

        from ..io import load_mono_normalized
        from ..metrics import lsd_db, snr_db

        rows = {}
        for path in sorted(glob.glob(os.path.join(args.restored_dir,
                                                  "*.wav"))):
            name = os.path.basename(path)
            opath = os.path.join(args.originals_dir, name)
            if not os.path.exists(opath):
                rows[name] = "no original"
                continue
            _, got = load_mono_normalized(path)
            _, ref = load_mono_normalized(opath)
            n = min(len(got), len(ref))
            rows[name] = {"snr_db": round(float(snr_db(ref[:n], got[:n])), 2),
                          "lsd_db": round(float(lsd_db(ref[:n], got[:n])), 2),
                          "samples": int(n)}
        _emit("score", rows, args.json)
        return 0
    if args.cmd == "serve":
        from ..pipelines.serve import run_serve

        res = run_serve(args.input_dir, args.output_dir, method=args.method,
                        epochs=args.epochs, originals_dir=args.originals,
                        seed=args.seed, devices=args.devices,
                        window_s=args.window_s)
        _emit("serve", res if args.json else res["files"], args.json)
        print(f"{res['clips']} clips -> {args.output_dir} "
              f"({res['wall_s']}s)", file=sys.stderr)
        return 0
    if args.cmd == "unet-gap":
        from ..pipelines.extras import run_unet_gap

        _emit("unet-gap", {"unet_gap": run_unet_gap(
            args.input, args.assets_dir, epochs=args.epochs,
            seed=args.seed)}, args.json)
        return 0
    if args.cmd in ("part0", "all"):
        from ..methods.gp import GPConfig
        from ..pipelines import run_part0

        gp_cfg = GPConfig(
            n_restarts=getattr(args, "gp_restarts", 5),
            opt_steps=getattr(args, "gp_steps", 20))
        _emit("part0", run_part0(args.input, args.assets_dir, seed=args.seed,
                                 gp_cfg=gp_cfg), args.json)
    if args.cmd in ("part1", "all"):
        from ..pipelines import run_part1

        _emit("part1", run_part1(args.input, args.assets_dir, seed=args.seed,
                                 unet_epochs=args.unet_epochs), args.json)
    if args.cmd in ("part2", "all"):
        from ..methods.diffusion import DiffusionConfig
        from ..pipelines import run_part2

        dcfg = DiffusionConfig(train_steps=args.diffusion_steps)
        dckpt = getattr(args, "diffusion_checkpoint", None)
        if dckpt is None:
            # the corpus prior (tools/train_diffusion_prior.py): inference-
            # only diffusion by default, like the reference's pretrained
            # pipeline (main_diffusion_gap.py:16-19). $AIT_DIFFUSION_PRIOR
            # overrides the repo-checkout default — an installed package has
            # no ../../checkpoints, and silently retraining per clip there
            # was a large unannounced behavior difference (round-4 ADVICE)
            _default = (os.environ.get("AIT_DIFFUSION_PRIOR")
                        or os.path.join(os.path.dirname(__file__), "..",
                                        "..", "checkpoints",
                                        "diffusion_prior"))
            if os.path.isdir(_default):
                dckpt = _default
                print("diffusion: using corpus prior at "
                      f"{os.path.normpath(_default)} "
                      "(--diffusion-checkpoint none to force per-clip)",
                      file=sys.stderr)
            else:
                print("diffusion: no corpus prior found (set "
                      "$AIT_DIFFUSION_PRIOR or --diffusion-checkpoint); "
                      "falling back to per-clip training — slower, and a "
                      "different semantic than the reference's pretrained "
                      "pipeline", file=sys.stderr)
        elif dckpt.lower() == "none":
            dckpt = None
        _emit("part2", run_part2(args.input, args.assets_dir, seed=args.seed,
                                 gan_epochs=args.gan_epochs,
                                 diffusion_cfg=dcfg,
                                 diffusion_checkpoint=dckpt), args.json)
    print(f"total wall: {time.time() - t_start:.1f}s", file=sys.stderr)
    return 0


def entry() -> None:  # pragma: no cover - console_scripts shim
    """`audio-inpainting-tpu` console entry point (pyproject [project.scripts])."""
    raise SystemExit(main())


if __name__ == "__main__":
    raise SystemExit(main())
