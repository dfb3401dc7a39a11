"""Configuration system: a yacs-compatible ``CfgNode`` plus the X3D default schema.

The reference framework drives everything off a yacs ``CfgNode`` built in
``configs/default.py:3-140`` and merged with the per-variant YAMLs in
``configs/kinetics/*.yaml``.  yacs is not a dependency of this framework; this
module provides a self-contained, behaviour-compatible subset (attribute
access, ``clone``, ``freeze``/``defrost``, ``merge_from_file``,
``merge_from_list``) so that the reference's YAML files drive this framework
unchanged.

Schema parity: every key under NETWORK / DATA / TRAIN / TEST / WANDB matches
the reference schema (``/root/reference/configs/default.py``).  A small TPU
group is added for features the reference does not have (cross-replica BN,
compute dtype, mesh shape); reference YAMLs never set these, so they merge
cleanly.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

import yaml

_IMMUTABLE = "__immutable__"


class CfgNode(dict):
    """A dict with attribute access, freezing, and recursive YAML merging.

    Compatible with the subset of the yacs API the reference uses:
    ``get_default_config().merge_from_file(path)`` + ``freeze()``
    (``/root/reference/train.py:39-41``).
    """

    def __init__(self, init_dict: Optional[Dict[str, Any]] = None):
        super().__init__()
        self.__dict__[_IMMUTABLE] = False
        for k, v in (init_dict or {}).items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(_IMMUTABLE, False):
            raise AttributeError(
                f"Attempted to set {name} on an immutable CfgNode (call defrost())"
            )
        self[name] = CfgNode(value) if isinstance(value, dict) else value

    # -- mutability --------------------------------------------------------
    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[_IMMUTABLE]

    def _set_immutable(self, value: bool) -> None:
        self.__dict__[_IMMUTABLE] = value
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(value)

    def __setitem__(self, key: str, value: Any) -> None:
        if self.__dict__.get(_IMMUTABLE, False):
            raise AttributeError(
                f"Attempted to set {key} on an immutable CfgNode (call defrost())"
            )
        super().__setitem__(key, value)

    # -- cloning / merging ---------------------------------------------------
    def clone(self) -> "CfgNode":
        node = CfgNode()
        for k, v in self.items():
            node[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return node

    def merge_from_file(self, path: str) -> None:
        with open(path, "r") as f:
            loaded = yaml.safe_load(f) or {}
        self._merge(loaded, path=[])

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        self._merge(other, path=[])

    def merge_from_list(self, opts: List[Any]) -> None:
        if len(opts) % 2 != 0:
            raise ValueError("merge_from_list expects [key, value, ...] pairs")
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            if isinstance(value, str):
                value = yaml.safe_load(value)
            node[leaf] = _coerce(value, node[leaf], key)

    def _merge(self, other: Dict[str, Any], path: List[str]) -> None:
        for k, v in other.items():
            full = ".".join(path + [str(k)])
            if k not in self:
                raise KeyError(f"Non-existent config key: {full}")
            if isinstance(v, dict):
                if not isinstance(self[k], CfgNode):
                    raise TypeError(f"Cannot merge dict into leaf key: {full}")
                self[k]._merge(v, path + [str(k)])
            else:
                self[k] = _coerce(v, self[k], full)

    # -- pretty printing ---------------------------------------------------
    def __str__(self) -> str:
        lines: List[str] = []
        for k in sorted(self.keys()):
            v = self[k]
            if isinstance(v, CfgNode):
                body = "\n".join("  " + line for line in str(v).split("\n"))
                lines.append(f"{k}:\n{body}")
            else:
                lines.append(f"{k}: {v}")
        return "\n".join(lines)

    __repr__ = __str__


def _coerce(value: Any, original: Any, key: str) -> Any:
    """Type-check a merged value against the schema default (yacs-style)."""
    if original is None or value is None:
        return value
    ok_casts = {
        (int, float): float,
        (float, int): float,  # YAML "5e-5" parses fine; int into float slot ok
        (list, tuple): tuple,
        (tuple, list): list,
    }
    if isinstance(value, type(original)) or isinstance(original, type(value)):
        return value
    cast = ok_casts.get((type(value), type(original)))
    if cast is not None:
        return cast(value)
    if isinstance(original, bool) and isinstance(value, int):
        return bool(value)
    # PyYAML reads exponent-form numbers without a dot ("5e-5") as strings
    if isinstance(value, str) and isinstance(original, (int, float)):
        try:
            return type(original)(float(value))
        except ValueError:
            pass
    raise TypeError(
        f"Type mismatch for key {key}: got {type(value).__name__}, "
        f"expected {type(original).__name__}"
    )


# ---------------------------------------------------------------------------
# Default schema — key-for-key parity with /root/reference/configs/default.py
# ---------------------------------------------------------------------------

def _build_default() -> CfgNode:
    c = CfgNode()

    # Network: the X3D expansion template (reference configs/default.py:8-46).
    c.NETWORK = CfgNode()
    c.NETWORK.C1_TEMP_FILTER = 5         # temporal kernel of the stem conv
    c.NETWORK.C1_CHANNELS = 12           # base channel count before widening
    c.NETWORK.SCALE_RES2 = False         # apply WIDTH_FACTOR at the stem too
    c.NETWORK.WIDTH_FACTOR = 1.0
    c.NETWORK.DEPTH_FACTOR = 1.0
    c.NETWORK.BOTTLENECK_WIDTH_FACTOR = 1.0
    c.NETWORK.NUM_CLASSES = 400
    c.NETWORK.DROPOUT_RATE = 0.0
    c.NETWORK.WEIGHT_DECAY = 0.00005
    c.NETWORK.BN = CfgNode()
    c.NETWORK.BN.MOMENTUM = 0.9          # EMA decay of running statistics
    c.NETWORK.BN.EPS = 1e-5

    # Data layer (reference configs/default.py:51-74).
    c.DATA = CfgNode()
    c.DATA.FRAME_RATE = 1                # temporal sampling stride
    c.DATA.TEMP_DURATION = 1             # frames per clip
    c.DATA.NUM_INPUT_CHANNELS = 3
    c.DATA.TRAIN_JITTER_SCALES = [182, 228]
    c.DATA.TRAIN_CROP_SIZE = 112
    c.DATA.TEST_CROP_SIZE = 160
    c.DATA.MEAN = [0.45, 0.45, 0.45]
    c.DATA.STD = [0.225, 0.225, 0.225]

    # Training (reference configs/default.py:79-103).
    c.TRAIN = CfgNode()
    c.TRAIN.DATASET_SIZE = 0
    c.TRAIN.BATCH_SIZE = 1
    c.TRAIN.EPOCHS = 1
    c.TRAIN.OPTIMIZER = "SGD"
    c.TRAIN.MOMENTUM = 0.9
    c.TRAIN.BASE_LR = 0.1
    c.TRAIN.WARMUP_EPOCHS = 1
    c.TRAIN.WARMUP_LR = 0.01

    # Multi-view test-time protocol (reference configs/default.py:108-117).
    c.TEST = CfgNode()
    c.TEST.NUM_SPATIAL_CROPS = 3
    c.TEST.NUM_TEMPORAL_VIEWS = 1
    c.TEST.BATCH_SIZE = 1

    # Weights & Biases (reference configs/default.py:122-137).
    c.WANDB = CfgNode()
    c.WANDB.ENABLE = False
    c.WANDB.PROJECT_NAME = "X3D-tf"
    c.WANDB.GROUP_NAME = " "
    c.WANDB.MODE = "online"
    c.WANDB.TENSORBOARD = True

    # Multigrid training (Wu et al., CVPR 2020) — long-cycle only.  The
    # reference lists this on its roadmap but never built it
    # (/root/reference/README.md:125); no reference YAML sets these keys.
    # Coarse phases keep B*T*S^2 ~ constant, so every phase's batch is a
    # multiple of the base (full 128-lane tiles on TPU) and the shape set
    # is static — one XLA compilation per phase (train/multigrid.py).
    c.MULTIGRID = CfgNode()
    c.MULTIGRID.ENABLE = False
    # (temporal factor, spatial factor) per long-cycle phase, coarse ->
    # fine; the last entry must be the base shape [1.0, 1.0].  The batch
    # multiplier is derived as round(1 / (t * s^2)): 8, 4, 2, 1.
    c.MULTIGRID.LONG_CYCLE_FACTORS = [
        [0.25, 0.7071], [0.5, 0.7071], [0.5, 1.0], [1.0, 1.0]]
    c.MULTIGRID.EPOCH_BLOCK = 1          # epochs spent in a phase before
                                         # advancing the cycle
    c.MULTIGRID.FINETUNE_FRACTION = 0.1  # trailing fraction of epochs pinned
                                         # to the base shape (paper's
                                         # fine-tuning segment)
    c.MULTIGRID.SPATIAL_DIVISOR = 8      # phase crop sizes round to this
    c.MULTIGRID.BN_RECALC_BATCHES = 0    # >0: re-estimate BN statistics over
                                         # N base-shape batches before each
                                         # validation pass (precise-BN analog)

    # TPU-native additions (no reference counterpart; absent from its YAMLs).
    c.TPU = CfgNode()
    c.TPU.SYNC_BN = True                 # True: batch stats over the global
                                         # batch; False: per-replica stats
                                         # (one BN group per data-axis shard,
                                         # reference MirroredStrategy
                                         # semantics — models/x3d.py
                                         # GroupedBatchNorm, SURVEY.md §5)
    c.TPU.COMPUTE_DTYPE = "bfloat16"     # conv compute dtype under jit
    c.TPU.MESH_DATA = -1                 # -1: all devices on the data axis
    c.TPU.MESH_MODEL = 1                 # tensor-parallel axis for the head
    c.TPU.REMAT = "auto"                 # remat: True/False/"auto" or a
                                         # granularity "block"/"stage"/
                                         # "convs" (auto = per-block for
                                         # the 312^2 variants only)
    c.TPU.TIME_FOLD = "auto"             # time-folded (B*T,1,H,W,C) layout
                                         # for sub-128-lane TRAIN batches
                                         # (L/XL): True/False/"auto" (auto
                                         # = TPU + B<128 + (B*T)%128==0;
                                         # the CLI resolves it per-device
                                         # and folds only train-shaped
                                         # batches — see tools/common.
                                         # setup_runtime).  Measured v5e-1:
                                         # L train 34.5->49.7, XL 27.6->
                                         # 33.7 clips/s with remat off
                                         # (docs/PERF.md)
    c.TPU.FUSED_DW = "auto"              # fused BN+ReLU+depthwise Pallas
                                         # kernel (ops/dw_fused.py):
                                         # True/False/"auto" (auto = TPU,
                                         # 128-lane batches, single chip)
    return c


_DEFAULT = _build_default()


def get_default_config() -> CfgNode:
    """Return a mutable clone of the default config (yacs-API compatible)."""
    return _DEFAULT.clone()
