"""Command-line interface (SURVEY.md §2.2 #13).

Subcommands mirroring the reference family's entry scripts, driven by the
single VSRConfig tree (JSON file + dotted overrides):

  python -m video_super_resolution_tpu.cli train --hr-root ... [--config c.json]
  python -m video_super_resolution_tpu.cli eval  --hr-root ... --ckpt-dir ...
  python -m video_super_resolution_tpu.cli infer --lr-root ... --out-dir ...
  python -m video_super_resolution_tpu.cli import-weights --torch-ckpt ...

Dotted overrides: --set model.window=5 train.lr=2e-4 mesh.data=4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import List

import numpy as np

from video_super_resolution_tpu.config import VSRConfig


def _apply_overrides(cfg: VSRConfig, overrides: List[str]) -> VSRConfig:
    d = dataclasses.asdict(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise SystemExit(f"bad --set override (want key=value): {ov}")
        key, val = ov.split("=", 1)
        parts = key.split(".")
        node = d
        for p in parts[:-1]:
            if p not in node:
                raise SystemExit(f"unknown config path: {key}")
            node = node[p]
        leaf = parts[-1]
        if leaf not in node:
            raise SystemExit(f"unknown config field: {key}")
        old = node[leaf]
        if isinstance(old, bool):
            node[leaf] = val.lower() in ("1", "true", "yes")
        elif isinstance(old, int):
            node[leaf] = int(val)
        elif isinstance(old, float):
            node[leaf] = float(val)
        elif isinstance(old, (list, tuple)):
            node[leaf] = [int(x) for x in val.split(",")]
        else:
            node[leaf] = val
    return VSRConfig.from_dict(d)


def _load_cfg(args) -> VSRConfig:
    cfg = VSRConfig()
    if args.config:
        cfg = VSRConfig.from_json(open(args.config).read())
    cfg = _apply_overrides(cfg, args.set or [])
    return cfg


def _add_common(p):
    p.add_argument("--config", help="VSRConfig JSON file")
    p.add_argument("--set", nargs="*", metavar="KEY=VAL",
                   help="dotted config overrides")


def cmd_train(args):
    from video_super_resolution_tpu.data.dataset import ClipDataset
    from video_super_resolution_tpu.training.loop import train

    cfg = _load_cfg(args)
    if args.ckpt_dir:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    ckpt_dir=args.ckpt_dir))
    train_ds = ClipDataset(
        hr_root=args.hr_root, lr_root=args.lr_root,
        window=cfg.model.window, scale=cfg.model.scale,
        crop_size=cfg.data.crop_size, augment=cfg.data.augment,
        edge_mode=cfg.data.edge_mode, seed=cfg.train.seed,
    )
    eval_ds = None
    if args.eval_hr_root:
        eval_ds = ClipDataset(
            hr_root=args.eval_hr_root, lr_root=args.eval_lr_root,
            window=cfg.model.window, scale=cfg.model.scale, augment=False,
            edge_mode=cfg.data.edge_mode,
        )
    out = train(cfg, train_ds, eval_ds, max_steps=args.steps,
                eval_every=args.eval_every)
    if out["eval"]:
        print(json.dumps(out["eval"], indent=2))


def cmd_eval(args):
    import jax.numpy as jnp

    from video_super_resolution_tpu.data.dataset import ClipDataset
    from video_super_resolution_tpu.evaluation.evaluate import evaluate_all
    from video_super_resolution_tpu.training.checkpoint import CheckpointManager
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import make_eval_step

    cfg = _load_cfg(args)
    mgr = CheckpointManager(args.ckpt_dir)
    stored = mgr.restore_config()
    if stored is not None:
        cfg = stored
    state = create_train_state(cfg)
    restored, step = mgr.restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    ds = ClipDataset(hr_root=args.hr_root, lr_root=args.lr_root,
                     window=cfg.model.window, scale=cfg.model.scale,
                     augment=False, edge_mode=cfg.data.edge_mode)
    res = evaluate_all(make_eval_step(restored.apply_fn), restored.params, ds,
                       cfg.data.y_channel_eval, cfg.data.border_crop)
    print(json.dumps({"step": step, **res}, indent=2))


def cmd_infer(args):
    import jax.numpy as jnp

    from video_super_resolution_tpu.data.dataset import (
        ClipDataset, list_clips, load_frame,
    )
    from video_super_resolution_tpu.training.checkpoint import CheckpointManager
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import make_eval_step

    cfg = _load_cfg(args)
    mgr = CheckpointManager(args.ckpt_dir)
    stored = mgr.restore_config()
    if stored is not None:
        cfg = stored
    state = create_train_state(cfg)
    restored, _ = mgr.restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    eval_step = make_eval_step(restored.apply_fn)

    clips = list_clips(args.lr_root)
    os.makedirs(args.out_dir, exist_ok=True)
    from PIL import Image

    from video_super_resolution_tpu.data.dataset import sliding_window_indices

    for clip, frames in clips.items():
        outd = os.path.join(args.out_dir, clip)
        os.makedirs(outd, exist_ok=True)
        arr = [load_frame(f) for f in frames]
        for c in range(len(arr)):
            idx = sliding_window_indices(len(arr), c, cfg.model.window,
                                         cfg.data.edge_mode)
            win = np.stack([arr[i] for i in idx])[None]
            hr = np.asarray(eval_step(restored.params, jnp.asarray(win)))[0]
            img = Image.fromarray(
                (np.clip(hr, 0, 1) * 255.0 + 0.5).astype(np.uint8)
            )
            img.save(os.path.join(outd, f"{c:08d}.png"))
        print(f"{clip}: {len(arr)} frames -> {outd}", file=sys.stderr)


def cmd_import_weights(args):
    from video_super_resolution_tpu.training.import_torch import (
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(args.torch_ckpt)
    print(json.dumps(
        {k: list(v.shape) for k, v in sd.items()}, indent=2
    ))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vsr-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train the VSR model")
    _add_common(p)
    p.add_argument("--hr-root", required=True)
    p.add_argument("--lr-root")
    p.add_argument("--eval-hr-root")
    p.add_argument("--eval-lr-root")
    p.add_argument("--ckpt-dir")
    p.add_argument("--steps", type=int)
    p.add_argument("--eval-every", type=int)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="evaluate a checkpoint (PSNR/SSIM)")
    _add_common(p)
    p.add_argument("--hr-root", required=True)
    p.add_argument("--lr-root")
    p.add_argument("--ckpt-dir", required=True)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("infer", help="x4 upscale LR clips to PNG frames")
    _add_common(p)
    p.add_argument("--lr-root", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--ckpt-dir", required=True)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("import-weights",
                       help="inspect/convert a torch checkpoint")
    _add_common(p)
    p.add_argument("--torch-ckpt", required=True)
    p.set_defaults(fn=cmd_import_weights)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
