"""Root-cause experiment for the stage-2 visibility-refresh instability.

Round 3 measured: enabling --vis_refresh_interval destabilizes the fitted
light balance (psnr_pbr 11.7 climbing -> 6.1 at a refresh boundary while
the env light inflated), so the quality harness runs with refresh OFF —
matching the reference, which left its refresh commented out
(/root/reference/train.py:110-112). This experiment isolates WHY.

Protocol: identical stage-2 runs on the oracle scene from a shared stage-1
checkpoint, with refresh off vs on; per-refresh the CLI now logs
mean_vis(old) -> mean_vis(new). Tracked per 100 iters: psnr_pbr,
light_mean. Hypothesis under test: traced visibility of a still-fuzzy
shell is biased dark (points inside the shell are attenuated by their own
neighbors), stage-2 opacity drift strengthens that bias, so every re-trace
steps visibility DOWN and the env light inflates to compensate — a ratchet,
not a transient.

Usage: python examples/diag_vis_refresh.py [--workdir /tmp/r3dg_visdiag]
       (expects the quality_eval smoke scene; generates it if missing)
"""
import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/r3dg_visdiag")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters1", type=int, default=1500)
    ap.add_argument("--iters2", type=int, default=2500)
    ap.add_argument("--refresh", type=int, default=500)
    ap.add_argument("--sample_num", type=int, default=32)
    args = ap.parse_args()

    scene_dir = os.path.join(args.workdir, "scene")
    out1 = os.path.join(args.workdir, "stage1")

    # Dataset + stage 1 (shared across arms), via the quality harness.
    if not os.path.exists(os.path.join(out1, f"chkpnt{args.iters1}.npz")):
        subprocess.run([sys.executable, "examples/quality_eval.py",
                        "--workdir", args.workdir,
                        "--size", str(args.size), "--n_train", "32",
                        "--n_test", "4", "--iters1", str(args.iters1),
                        "--iters2", "1", "--max_init_points", "12000",
                        "--eval_sample_num", "32",
                        "--report", os.path.join(args.workdir, "_setup.md"),
                        ], check=False,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))

    from relightable3dgaussian_tpu.cli import train as train_cli

    results = {}
    total2 = args.iters1 + args.iters2
    for arm, refresh in (("off", 0), ("on", args.refresh)):
        out2 = os.path.join(args.workdir, f"stage2_{arm}")
        log = os.path.join(args.workdir, f"stage2_{arm}.log")
        import contextlib
        import io
        buf = io.StringIO()

        class Tee(io.TextIOBase):
            def write(self, s):
                buf.write(s)
                sys.__stdout__.write(s)
                return len(s)

            def flush(self):
                sys.__stdout__.flush()

        with contextlib.redirect_stdout(Tee()):
            train_cli.main([
                "-s", scene_dir, "-m", out2, "-t", "neilf", "--eval", "-w",
                "-c", os.path.join(out1, f"chkpnt{args.iters1}.npz"),
                "--iterations", str(total2),
                "--sample_num", str(args.sample_num),
                "--position_lr_init", "0.000016",
                "--position_lr_final", "0.00000016",
                "--normal_lr", "0.001", "--sh_lr", "0.00025",
                "--opacity_lr", "0.005", "--scaling_lr", "0.0005",
                "--rotation_lr", "0.0001",
                "--lambda_light", "0.01", "--lambda_env_smooth", "0.01",
                "--lambda_base_color_smooth", "0",
                "--lambda_roughness_smooth", "0",
                "--lambda_light_smooth", "0",
                "--vis_refresh_interval", str(refresh),
                "--save_interval", str(total2),
                "--checkpoint_interval", str(total2),
                "--test_interval", "500",
            ])
        text = buf.getvalue()
        with open(log, "w") as f:
            f.write(text)
        traj = re.findall(
            r"iter\s+(\d+) loss ([\d.]+) psnr ([\d.]+) psnr_pbr ([\d.]+)",
            text)
        refreshes = re.findall(
            r"ITER (\d+)\] re-traced visibility.*mean_vis ([\d.]+) -> "
            r"([\d.]+)", text)
        results[arm] = {"traj": [(int(a), float(d)) for a, _, _, d in traj],
                        "refreshes": [(int(a), float(b), float(c))
                                      for a, b, c in refreshes]}
        print(f"\n=== arm {arm}: last psnr_pbr "
              f"{results[arm]['traj'][-1] if traj else None}, "
              f"refresh mean_vis steps: {results[arm]['refreshes']}\n",
              flush=True)

    with open(os.path.join(args.workdir, "diag.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: {"final": v["traj"][-1] if v["traj"] else None,
                          "refreshes": v["refreshes"]}
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
