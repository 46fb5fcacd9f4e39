"""One-command quality evaluation over an inference output directory.

Flow (VERDICT r4 next #6):
    1. render:   python -m posetraj_tpu.inference --mode vipseg ... --output_dir OUT
                 (writes OUT/<video>/pred/ and OUT/<video>/gt/ frame folders —
                  the same per-frame export layout the reference emits for
                  external FID/FVD tooling, run_inference_vipseg_json_repro.py
                  :307-318)
    2. metrics:  python scripts/eval_metrics.py OUT
                 -> per-video windowed SSIM (Wang et al. 11x11 Gaussian) +
                    PSNR, aggregated means, written to OUT/metrics.json and
                    printed as one JSON line.

ObjMC needs an external point tracker over the generated frames (the paper
uses CoTracker); pass --objmc-npz with arrays target_points/tracked_points
(K, F, 2) to include it. FID/FVD stay export-for-external-tooling by design:
they need pretrained Inception/I3D weights this environment cannot fetch —
the pred/ and gt/ folders ARE the export format those tools consume.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_frames(folder: str) -> np.ndarray:
    from PIL import Image

    names = sorted(
        f for f in os.listdir(folder) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not names:
        raise FileNotFoundError(f"no frames in {folder}")
    return np.stack(
        [np.asarray(Image.open(os.path.join(folder, n)), dtype=np.float32) / 255.0
         for n in names]
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("output_dir", help="inference output dir (contains <video>/pred, <video>/gt)")
    p.add_argument("--pred-name", default="pred")
    p.add_argument("--gt-name", default="gt")
    p.add_argument("--objmc-npz", default=None,
                   help="npz with target_points/tracked_points (K,F,2) per the paper's ObjMC")
    args = p.parse_args(argv)

    from posetraj_tpu.data import metrics

    per_video = {}
    for name in sorted(os.listdir(args.output_dir)):
        vid_dir = os.path.join(args.output_dir, name)
        pred_dir = os.path.join(vid_dir, args.pred_name)
        gt_dir = os.path.join(vid_dir, args.gt_name)
        if not (os.path.isdir(pred_dir) and os.path.isdir(gt_dir)):
            continue
        pred, gt = load_frames(pred_dir), load_frames(gt_dir)
        f = min(len(pred), len(gt))
        per_video[name] = metrics.video_psnr_ssim(pred[:f], gt[:f])

    if not per_video:
        print(f"no <video>/{args.pred_name} + <video>/{args.gt_name} pairs under "
              f"{args.output_dir}", file=sys.stderr)
        return 1

    result = {
        "n_videos": len(per_video),
        "psnr": float(np.mean([v["psnr"] for v in per_video.values()])),
        "ssim": float(np.mean([v["ssim"] for v in per_video.values()])),
        "per_video": per_video,
    }
    if args.objmc_npz:
        data = np.load(args.objmc_npz)
        result["objmc"] = metrics.objmc(data["target_points"], data["tracked_points"])

    out_path = os.path.join(args.output_dir, "metrics.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "per_video"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
