"""Command-line interface — the build's replacement for the reference's
Win32 app shell (main.cpp:266-423): offline progressive rendering to
image files instead of a swapchain, plus AOV dumps and inverse
rendering.

Usage:
  python -m raypt.app.cli render --scene cornell_bunny --size 512 \
      --spp 16 --bounces 6 -o out.png [--aovs] [--checkpoint state.npz]
  python -m raypt.app.cli bench --size 1024 --bounces 4
  python -m raypt.app.cli inverse --steps 100 -o recovered.npz
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def _build_scene(name: str, size, obj: str | None):
    from ..scenes import (cornell_box, cornell_box_with_bunny,
                          stanford_bunny, textured_demo, triangle_ground)
    from ..core.scene import MaterialDef, SceneBuilder
    from ..scenes.builtin import load_reference_envmap

    if name == "cornell":
        b = cornell_box()
    elif name == "bunny":
        b = stanford_bunny()
    elif name == "cornell_bunny":
        b = cornell_box_with_bunny()
    elif name == "triangle":
        b = triangle_ground()
    elif name == "textured":
        b = textured_demo()
    elif name == "config4":
        # BASELINE configs[3]: multi-mesh glTF + textures + HDR env
        # (render with --bounces 8; refraction is enabled by cmd_render
        # when the scene carries a refractive material)
        from ..scenes.config4 import config4_scene
        b = config4_scene()
    elif name == "obj":
        if not obj:
            raise SystemExit("--obj PATH required for --scene obj")
        import numpy as np
        from ..io import load_mesh
        mesh = load_mesh(obj)   # OBJ, PLY, or glTF/GLB by signature
        b = SceneBuilder(env=load_reference_envmap())
        gltf_mats = mesh.get("materials")
        if gltf_mats and mesh.get("face_materials") is not None:
            # carry glTF pbr materials through; one add_mesh per
            # material group (faces of one group share a material id)
            fm = np.asarray(mesh["face_materials"])
            ids = [b.add_material(MaterialDef(
                albedo=m["albedo"], emissive=m["emissive"],
                roughness=m["roughness"])) for m in gltf_mats]
            default = b.add_material(MaterialDef(albedo=(0.8, 0.8, 0.8)))
            for mi in np.unique(fm):
                mat = ids[mi] if 0 <= mi < len(ids) else default
                b.add_mesh(mesh["positions"], mesh["normals"],
                           mesh["faces"][fm == mi], uvs=mesh["uvs"],
                           material=mat)
        else:
            mat = b.add_material(MaterialDef(albedo=(0.8, 0.8, 0.8)))
            b.add_mesh(mesh["positions"], mesh["normals"], mesh["faces"],
                       uvs=mesh["uvs"], material=mat)
        # auto-frame: back the camera off along +z from the bbox center
        # far enough to fit the mesh in the 90 deg frustum
        lo = np.min(mesh["positions"], axis=0)
        hi = np.max(mesh["positions"], axis=0)
        center = (lo + hi) / 2
        radius = float(np.linalg.norm(hi - lo)) / 2 or 1.0
        b.camera.position = tuple(center + np.array([0, 0, 2.2 * radius]))
        b.camera.angle_y = 0.0
    else:
        raise SystemExit(f"unknown scene {name!r}")
    b.camera.viewport_width, b.camera.viewport_height = size
    return b


def cmd_render(args):
    import jax
    import numpy as np

    from ..accel import build, pack
    from ..core.types import RenderConfig
    from ..io import write_png, save_render_state, load_render_state
    from ..render import accumulate, render_aovs, render_frame, to_display
    from .metrics import RenderMetrics, Timer

    size = (args.size, args.size) if isinstance(args.size, int) else args.size
    b = _build_scene(args.scene, size, args.obj)
    scene = b.freeze()
    # turn the dielectric lobe on iff the scene carries a refractive
    # material (static cfg flag; zero-cost and bitwise-noop otherwise)
    refr = bool(float(scene.materials.refraction_percent.max()) > 0.0)
    cfg = RenderConfig(width=size[0], height=size[1],
                       samples_per_pixel=args.spp, num_bounces=args.bounces,
                       backend=args.backend, enable_refraction=refr,
                       onehot_leaf=args.onehot_leaf,
                       onehot_expand=args.onehot_expand,
                       onehot_compact=args.onehot_compact)
    bvh = None
    if cfg.backend in ("bvh", "auto", "pallas"):
        bvh = build(scene.mesh.positions, scene.mesh.faces,
                    scene.mesh.face_valid)
    elif cfg.backend == "onehot":
        from ..accel.ctree import build_onehot
        the_bvh = build(scene.mesh.positions, scene.mesh.faces,
                        scene.mesh.face_valid)
        bvh = build_onehot(the_bvh, scene.mesh.positions,
                           scene.mesh.faces, scene.mesh.face_valid,
                           leaf=cfg.onehot_leaf)

    key = jax.random.key(args.seed)
    acc, start_frame = None, 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        acc, start_frame, key = load_render_state(args.checkpoint)
        print(f"resumed at frame {start_frame}", file=sys.stderr)

    timer = Timer()
    for fi in range(start_frame, start_frame + args.frames):
        if args.check:
            from .debug import checked_render_frame
            _, img = checked_render_frame(scene, cfg, key, frame_index=fi,
                                          bvh=bvh, throw=True)
        else:
            img = render_frame(scene, cfg, key, frame_index=fi, bvh=bvh)
        acc = img if acc is None else accumulate(acc, img, fi)
    jax.block_until_ready(acc)
    secs = timer.lap()

    m = RenderMetrics(width=size[0], height=size[1], spp=args.spp,
                      bounces=args.bounces, frames=args.frames, seconds=secs)
    m.log(scene=args.scene, backend=cfg.backend)

    write_png(args.output, to_display(acc, args.exposure))
    print(f"wrote {args.output}", file=sys.stderr)
    if args.checkpoint:
        save_render_state(args.checkpoint, acc, start_frame + args.frames, key)
    if args.aovs:
        base = os.path.splitext(args.output)[0]
        aov = render_aovs(scene, cfg, bvh=bvh)
        d = np.asarray(aov["depth"])
        dmax = d.max() or 1.0
        write_png(base + ".depth.png", d / dmax)
        write_png(base + ".normal.png", np.asarray(aov["normal"]) * 0.5 + 0.5)
        write_png(base + ".albedo.png", np.asarray(aov["albedo"]))
        print(f"wrote {base}.{{depth,normal,albedo}}.png", file=sys.stderr)


def cmd_bench(args):
    os.environ.setdefault("BENCH_WIDTH", str(args.size))
    os.environ.setdefault("BENCH_HEIGHT", str(args.size))
    os.environ.setdefault("BENCH_BOUNCES", str(args.bounces))
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, root)
    import importlib
    bench = importlib.import_module("bench")
    bench.main()


def cmd_inverse(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.types import RenderConfig
    from ..diff import apply_params, fit
    from ..io import save_pytree
    from ..render import render_frame
    from .metrics import log_step

    size = (args.size, args.size)
    b = _build_scene(args.scene, size, args.obj)
    scene = b.freeze()
    cfg = RenderConfig(width=size[0], height=size[1],
                       samples_per_pixel=args.spp, num_bounces=args.bounces,
                       backend="bruteforce" if scene.mesh.num_faces < 512
                       else "bvh", russian_roulette=False)

    # self-target demo: perturb albedo, recover it
    key = jax.random.key(args.seed)
    views = [scene.camera]
    targets = jnp.stack([render_frame(scene, cfg, key)])
    bad = scene.replace(materials=scene.materials.replace(
        albedo=jnp.clip(scene.materials.albedo + 0.3, 0.02, 0.98)))

    params, losses = fit(bad, cfg, views, targets,
                         trainable=tuple(args.trainable.split(",")),
                         steps=args.steps, learning_rate=args.lr, key=key,
                         callback=lambda i, p, l: log_step(i, l)
                         if i % 10 == 0 else None)
    save_pytree(args.output, params, step=args.steps)
    print(f"final loss {losses[-1]:.6f} -> {args.output}", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="raypt")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="progressive render to PNG")
    pr.add_argument("--scene", default="cornell_bunny",
                    choices=["cornell", "bunny", "cornell_bunny", "triangle",
                             "textured", "config4", "obj"])
    pr.add_argument("--obj", default=None, help="OBJ path for --scene obj")
    pr.add_argument("--size", type=int, default=512)
    pr.add_argument("--spp", type=int, default=5)
    pr.add_argument("--bounces", type=int, default=6)
    pr.add_argument("--frames", type=int, default=1)
    pr.add_argument("--backend", default="auto",
                    choices=["auto", "bvh", "bvh2", "bvh4", "dense",
                             "bruteforce", "pallas", "onehot", "cluster"])
    pr.add_argument("--onehot-leaf", type=int, default=384,
                    help="backend onehot: triangles/cluster (384 = "
                         "round-5 measured optimum with the expansion "
                         "kernel; 128 for the dense-union kernel)")
    pr.add_argument("--onehot-expand", type=int, default=8192,
                    help="backend onehot: rays/program for the "
                         "per-ray-exact phase-B expansion kernel "
                         "(0 = dense per-tile union kernel)")
    pr.add_argument("--onehot-compact", type=int, default=32768,
                    help="backend onehot: in-kernel alive-compaction "
                         "group (0 = off); only with --onehot-expand")
    pr.add_argument("--exposure", type=float, default=0.5)
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--checkpoint", default=None)
    pr.add_argument("--aovs", action="store_true")
    pr.add_argument("--check", action="store_true",
                    help="render under checkify NaN/Inf/OOB checks "
                         "(debug mode, slower)")
    pr.add_argument("-o", "--output", default="render.png")
    pr.set_defaults(fn=cmd_render)

    pb = sub.add_parser("bench", help="run the benchmark")
    pb.add_argument("--size", type=int, default=1024)
    pb.add_argument("--bounces", type=int, default=4)
    pb.set_defaults(fn=cmd_bench)

    pi = sub.add_parser("inverse", help="inverse-rendering demo")
    pi.add_argument("--scene", default="triangle")
    pi.add_argument("--obj", default=None)
    pi.add_argument("--size", type=int, default=32)
    pi.add_argument("--spp", type=int, default=1)
    pi.add_argument("--bounces", type=int, default=2)
    pi.add_argument("--steps", type=int, default=100)
    pi.add_argument("--lr", type=float, default=0.05)
    pi.add_argument("--seed", type=int, default=0)
    pi.add_argument("--trainable", default="albedo_logits")
    pi.add_argument("-o", "--output", default="params.npz")
    pi.set_defaults(fn=cmd_inverse)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
