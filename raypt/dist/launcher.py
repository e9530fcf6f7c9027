"""Multi-host launcher (BASELINE config #5 / SURVEY §5.8).

One process per host; rendezvous via env vars or flags, then the same
mesh-sharded render/train code as single-host (raypt.dist.sharding) —
the DCN/ICI split is transparent to the program, XLA routes collectives.

  RAYPT_COORDINATOR=host0:1234 RAYPT_NUM_PROCS=4 RAYPT_PROC_ID=0 \
      python -m raypt.dist.launcher render --size 1024 ...

On a single machine this degrades to the local devices (and the test
suite exercises the same code on the 8-device virtual CPU mesh).
"""
from __future__ import annotations

import argparse
import os
import sys

import jax


def setup_from_env() -> None:
    coord = os.environ.get("RAYPT_COORDINATOR")
    if not coord:
        return
    nprocs = int(os.environ.get("RAYPT_NUM_PROCS", "1"))
    pid = int(os.environ.get("RAYPT_PROC_ID", "0"))
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)


def main(argv=None):
    setup_from_env()
    ap = argparse.ArgumentParser(prog="raypt.dist.launcher")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render")
    pr.add_argument("--scene", default="cornell_bunny")
    pr.add_argument("--size", type=int, default=512)
    pr.add_argument("--spp", type=int, default=4)
    pr.add_argument("--bounces", type=int, default=4)
    pr.add_argument("-o", "--output", default="render_dist.png")

    pi = sub.add_parser("bench")
    pi.add_argument("--size", type=int, default=512)
    pi.add_argument("--bounces", type=int, default=4)
    pi.add_argument("--devices", type=int, default=0,
                    help="mesh size (0 = all local+remote devices)")

    args = ap.parse_args(argv)
    n_dev = len(jax.devices())
    print(f"process {jax.process_index()}/{jax.process_count()}, "
          f"{n_dev} devices", file=sys.stderr)

    from ..accel import build
    from ..core.types import RenderConfig
    from ..dist.sharding import default_mesh, render_frame_sharded
    from ..scenes import cornell_box_with_bunny, cornell_box

    builder = (cornell_box_with_bunny() if args.scene == "cornell_bunny"
               else cornell_box())
    builder.camera.viewport_width = builder.camera.viewport_height = args.size
    scene = builder.freeze()
    cfg = RenderConfig(width=args.size, height=args.size,
                       samples_per_pixel=args.spp, num_bounces=args.bounces,
                       backend="bvh")
    bvh = build(scene.mesh.positions, scene.mesh.faces,
                scene.mesh.face_valid)
    mesh = default_mesh(getattr(args, "devices", 0) or None)
    key = jax.random.key(0)

    if args.cmd == "render":
        from ..io import write_png
        from ..render import to_display
        img = render_frame_sharded(scene, cfg, key, mesh, bvh=bvh)
        if jax.process_index() == 0:
            write_png(args.output, to_display(img))
            print(f"wrote {args.output}", file=sys.stderr)
    else:
        import time
        img = render_frame_sharded(scene, cfg, key, mesh, bvh=bvh)
        jax.block_until_ready(img)
        ts = []
        for i in range(3):
            t0 = time.time()
            img = render_frame_sharded(scene, cfg,
                                       jax.random.fold_in(key, i), mesh,
                                       bvh=bvh)
            jax.block_until_ready(img)
            ts.append(time.time() - t0)
        segs = args.size * args.size * args.spp * args.bounces
        print(f"devices={mesh.devices.size} "
              f"{segs / min(ts) / 1e6:.2f} Mray-seg/s", file=sys.stderr)


if __name__ == "__main__":
    main()
