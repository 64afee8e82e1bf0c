"""Config dataclasses for the whole framework.

One serializable config tree (SURVEY.md §5.6): model topology, data, training,
mesh/parallelism. The reference family used argparse flags scattered over entry
scripts; here a single dataclass tree is the source of truth, is serialized
into every checkpoint, and is overridable from the CLI.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Topology of the VSR model (flow + depth + fusion + SR head).

    Defaults follow the PWC-flow + depth-fusion + pixel-shuffle family the
    capability contract describes (SURVEY.md §2.1); every knob the re-survey
    protocol flags as parity-relevant (window size, max displacement, pyramid
    depth) is explicit here so it can be corrected without code changes.
    """

    scale: int = 4                      # SR upscale factor (x4 per spec)
    window: int = 3                     # temporal window (3 or 5 per spec)
    # --- feature pyramid / flow ---
    pyramid_levels: int = 5             # strided-conv pyramid depth
    pyramid_channels: Tuple[int, ...] = (16, 32, 64, 96, 128)
    max_displacement: int = 4           # cost volume radius d -> (2d+1)^2=81 ch
    # finest pyramid level that runs a flow estimator. Level 0 is 1/2 input
    # resolution; 1 is 1/4 (the PWC-Net convention: estimate at 1/4, upsample
    # to full). 1 halves flow-net cost vs 0 with the standard quality profile.
    flow_finest_level: int = 1
    flow_estimator_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    context_channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32)
    # --- depth branch ---
    depth_channels: int = 64            # hourglass width
    depth_levels: int = 4               # hourglass downsampling depth
    # --- fusion + SR head ---
    fusion_channels: int = 64
    sr_channels: int = 64
    # 5 wide (C->2C->C) residual blocks == 10 narrow blocks in MACs and conv
    # depth, but every trunk conv gets a 128-lane side the MXU fills
    # (ops note in models/common.ResBlock)
    sr_blocks: int = 5                  # residual blocks in the SR trunk
    sr_wide_blocks: bool = True
    lrelu_slope: float = 0.1
    # --- TPU performance variants (both preserve the capability contract) ---
    # warp neighbor frames+depth (4ch) and encode after warping, instead of
    # warping 64ch features: 16x less gather traffic on the HBM-bound warp
    warp_features: bool = False
    # "espcn": trunk + conv(3*scale^2) + one pixel_shuffle(scale) — every
    # conv at LR. "two_stage": conv→ps2→lrelu twice + 3ch conv at full res
    # (the torch-reference-era layout).
    sr_head_style: str = "espcn"
    # espcn-only: width of an extra ConvLReLU inserted at LR before the
    # subpixel conv (0 = off). Closes the espcn head's capacity gap vs
    # two_stage while keeping every conv at LR (tools/quality_ab.py).
    sr_espcn_mid: int = 0
    # run the depth hourglass on 1/2-res frames and upsample its output x2:
    # depth is a smooth fusion guide; halves the second-biggest conv cost
    depth_at_half_res: bool = True
    # resolution divisor for the depth branch input (param tree unchanged —
    # only the pre/post resizes move). 0 (default) = derive from the legacy
    # depth_at_half_res bool (2 if set else 1), so configs/checkpoints that
    # never set this field keep their trained-time numerics — the r4 default
    # of 4 silently changed inference for pre-r4 checkpoints because the
    # param tree is byte-identical (ADVICE r4 medium #2). The SERVING
    # configuration opts into 4 explicitly (see serving_config()): the r4
    # stage map measured the depth branch at 16.6 ms/frame (540x960, ~20%
    # of the model) and the production-width quality harness measured
    # divisor 4 as quality-free (oracle PSNR 41.5099 vs 41.5103 at divisor
    # 2; serving-path delta -0.0155 dB — QUALITY.md round-4 table).
    depth_res_divisor: int = 0
    # backward-warp implementation at model call sites: "pallas" is the
    # hand-written shift-select TPU kernel (ops/pallas/warp_shift_tpu.py;
    # exact for smooth flow — docstring gives the exactness domain; C>8 and
    # small shapes fall back to "tiled" automatically); "tiled" is the
    # pure-XLA shift-select; "gather" is the per-pixel-exact XLA gather
    # (slow on TPU: the gather scalarizes).
    warp_impl: str = "pallas"

    @property
    def num_neighbors(self) -> int:
        return self.window - 1

    @property
    def cost_volume_channels(self) -> int:
        d = self.max_displacement
        return (2 * d + 1) ** 2


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Sliding-temporal-window clip pipeline (SURVEY.md §2.2 #9)."""

    train_root: str = ""
    eval_root: str = ""
    window: int = 3
    scale: int = 4
    crop_size: int = 64                 # LR crop (HR crop = crop*scale)
    batch_size: int = 4
    augment: bool = True                # random flips + temporal reverse
    edge_mode: str = "replicate"        # clip-edge window padding policy
    y_channel_eval: bool = True         # Vid4 convention: PSNR/SSIM on Y
    border_crop: int = 4                # crop `scale` px border before metrics


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    lr_schedule: str = "cosine"         # "cosine" | "step" | "const"
    lr_step_every: int = 100_000
    lr_step_gamma: float = 0.5
    steps: int = 300_000
    warmup_steps: int = 2_000
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    charbonnier_eps: float = 1e-6
    ckpt_dir: str = "/tmp/vsr_tpu_ckpt"
    ckpt_every: int = 1_000
    keep_ckpts: int = 5
    log_every: int = 100
    seed: int = 0
    compute_dtype: str = "bfloat16"     # MXU-friendly compute
    param_dtype: str = "float32"        # fp32 master params & loss


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes (SURVEY.md §2.4/§2.5).

    axes: ("data", "time", "space", "model") — batch DP, temporal
    context-parallel (timeline shards + frame halo exchange), spatial
    tiling of H for 4K activations (conv-halo exchange), and tensor
    parallelism (Megatron-style channel sharding of the SR trunk,
    parallel/tensor.py). A size of 1 disables an axis. "model" is the
    innermost axis so its per-block all-reduce rides the fastest ICI
    links.
    """

    data: int = 1
    time: int = 1
    space: int = 1
    model: int = 1

    @property
    def shape(self):
        return {"data": self.data, "time": self.time, "space": self.space,
                "model": self.model}

    @property
    def num_devices(self) -> int:
        return self.data * self.time * self.space * self.model


@dataclasses.dataclass(frozen=True)
class VSRConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    use_pallas: bool = False            # Pallas kernels vs XLA fallbacks

    # ---------- (de)serialization ----------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "VSRConfig":
        return cls.from_dict(json.loads(s))

    @classmethod
    def from_dict(cls, d: dict) -> "VSRConfig":
        def _mk(klass, sub: Optional[dict]):
            if sub is None:
                return klass()
            fields = {f.name for f in dataclasses.fields(klass)}
            kw: dict[str, Any] = {}
            for k, v in sub.items():
                if k not in fields:
                    raise ValueError(f"unknown {klass.__name__} field: {k}")
                if isinstance(v, list):
                    v = tuple(v)
                kw[k] = v
            return klass(**kw)

        return cls(
            model=_mk(ModelConfig, d.get("model")),
            data=_mk(DataConfig, d.get("data")),
            train=_mk(TrainConfig, d.get("train")),
            mesh=_mk(MeshConfig, d.get("mesh")),
            use_pallas=bool(d.get("use_pallas", False)),
        )

    def replace(self, **kw) -> "VSRConfig":
        return dataclasses.replace(self, **kw)


def serving_config(**model_overrides: Any) -> VSRConfig:
    """The production/serving configuration: dataclass defaults plus the
    perf knobs that are quality-gated for serving but intentionally NOT
    baked into the defaults (so checkpoint-stamped configs keep their
    trained-time numerics; ADVICE r4 medium #2).

    Currently: quarter-res depth (depth_res_divisor=4, measured
    quality-free at production width — QUALITY.md round-4 table). bench.py,
    the driver entry, and the stage-map tools all build from here.
    """
    cfg = VSRConfig()
    return cfg.replace(model=dataclasses.replace(
        cfg.model, depth_res_divisor=4, **model_overrides))
