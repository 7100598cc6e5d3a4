#!/usr/bin/env python
"""Offline fuser CLI: dataset replay with pause/step terminal control.

Reference: `FuserNode` + `fuser_node_main.cpp:47-52` — replay a dataset
through the mapping pipeline with interactive pause (space), single-step
(s), and quit (q) terminal control (terminal_reading.cpp).

Usage:
  python tools/fuser_cli.py --dataset synthetic --frames 32 --out out/
  python tools/fuser_cli.py --dataset replica --path ~/Replica/office0 \
      --voxel-size 0.05 --out out/
  python tools/fuser_cli.py --dataset recorded --path seq_dir/ --out out/
"""

import argparse
import select
import sys
import termios
import time
import tty
from pathlib import Path


def _make_loader(args):
    if args.dataset == "synthetic":
        from isaac_ros_nvblox_tpu.datasets.synthetic import SyntheticDataLoader
        return SyntheticDataLoader(num_frames=args.frames)
    if args.dataset == "replica":
        from isaac_ros_nvblox_tpu.datasets.replica import ReplicaDataLoader
        return ReplicaDataLoader(args.path, max_frames=args.frames or None)
    if args.dataset == "3dmatch":
        from isaac_ros_nvblox_tpu.datasets.replica import ThreeDMatchDataLoader
        return ThreeDMatchDataLoader(args.path, max_frames=args.frames or None)
    if args.dataset == "redwood":
        from isaac_ros_nvblox_tpu.datasets.replica import RedwoodDataLoader
        return RedwoodDataLoader(args.path, max_frames=args.frames or None)
    if args.dataset == "recorded":
        from isaac_ros_nvblox_tpu.datasets.recorded import RecordedDataLoader
        return RecordedDataLoader(args.path,
                                  tf_lead_time_s=args.tf_lead_time)
    raise SystemExit(f"unknown dataset {args.dataset!r}")


class _Keyboard:
    """Non-blocking single-key reader (parity: terminal_reading.cpp)."""

    def __enter__(self):
        self._fd = sys.stdin.fileno() if sys.stdin.isatty() else None
        if self._fd is not None:
            self._old = termios.tcgetattr(self._fd)
            tty.setcbreak(self._fd)
        return self

    def __exit__(self, *exc):
        if self._fd is not None:
            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._old)

    def poll(self):
        if self._fd is None:
            return None
        if select.select([sys.stdin], [], [], 0)[0]:
            return sys.stdin.read(1)
        return None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "replica", "3dmatch", "redwood",
                             "recorded"])
    ap.add_argument("--path", default=None)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--voxel-size", type=float, default=0.05)
    ap.add_argument("--out", default="fuser_out")
    ap.add_argument("--no-color", action="store_true")
    ap.add_argument("--tf-lead-time", type=float, default=0.5,
                    help="pose-stream lead over images for --dataset "
                         "recorded (parity: tf_lead_time_s)")
    args = ap.parse_args()

    from isaac_ros_nvblox_tpu.datasets.fuser import Fuser, FuserConfig
    from isaac_ros_nvblox_tpu.utils.timing import Rates, Timing

    loader = _make_loader(args)
    fuser = Fuser(loader, FuserConfig(voxel_size_m=args.voxel_size))

    paused = False
    print("controls: [space] pause/resume, [s] step, [q] quit")
    with _Keyboard() as kb:
        it = iter(loader)
        while True:
            key = kb.poll()
            if key == "q":
                break
            if key == " ":
                paused = not paused
                print("paused" if paused else "resumed")
            step = key == "s"
            if paused and not step:
                time.sleep(0.05)
                continue
            try:
                frame = next(it)
            except StopIteration:
                break
            fuser.integrate_frame(frame)
            if fuser.frame_count % 10 == 0:
                print(f"frame {fuser.frame_count}, "
                      f"{fuser.mapper.block_count()} blocks, "
                      f"depth {Rates.rate_hz('fuser/depth'):.1f} Hz")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fuser.mapper.update_esdf()
    fuser._update_mesh(full=True)
    fuser.output_mesh_ply(out / "mesh.ply")
    from isaac_ros_nvblox_tpu.io.ply import write_voxel_layer_ply
    from isaac_ros_nvblox_tpu.io.ply import write_voxel_layer_ply_device
    write_voxel_layer_ply_device(out / "tsdf.ply", fuser.mapper, "tsdf")
    write_voxel_layer_ply_device(out / "esdf.ply", fuser.mapper, "esdf")
    (out / "timings.txt").write_text(Timing.to_string() + "\n")
    print(f"wrote {out}/mesh.ply, tsdf.ply, esdf.ply, timings.txt")
    print(Timing.to_string())


if __name__ == "__main__":
    main()
