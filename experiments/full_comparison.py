"""Full-comparison training driver.

Capability parity with reference ``experiments/full_comparison.py``: one
entry point that builds the candidate-model dict (flagship Routeformer
variants + GPS-only ablations + external baselines + trivial baselines),
trains them in lockstep on identical batches with one optimizer
(``ParallelTrainer``), and evaluates with MC-averaged, PCI-bucketed
metrics. Configuration is by environment variables, matching the
reference's env-var "CLI" (reference :50-150):

  DATASET=DREYEVE|Routeformer  DEBUG=0|1  EPOCHS  MIN_PCI  OUTPUT_FPS
  BATCH_SIZE  RESULTS_DIR  MODEL_SET=full|gps|flagship  DISCOUNTED_FACTOR
  ROUTEFORMER_DATASET_DIR / DREYEVE_DATASET_DIR (falls back to synthetic
  data when unset/absent — this container ships no GEM/DR(eye)VE footage)

Transfer-layer extensions (this build; see docs/PERF.md):
  VIDEO_DTYPE=uint8|float16  — dataset wire format (default uint8)
  H2D_DEDUP=1|0              — device frame store on single-device loaders
  USE_EMBEDDING_CACHE=0|1|host|device — torchcache steady state; "device"
                               memoizes features on-device (zero video
                               bytes on the wire for warm batches)

TPU-native differences: Lightning/DDP is replaced by the jitted lockstep
trainer over a jax mesh; checkpointing is orbax with explicit resume; W&B
is optional (JSONL metric stream otherwise).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.getenv("ROUTEFORMER_FORCE_CPU", "0") == "1":
    # debug/smoke runs on the host CPU (the env preimports jax with the TPU
    # backend; switching platforms must go through jax.config)
    jax.config.update("jax_platforms", "cpu")
import numpy as np
from flax import nnx

from routeformer_tpu import set_logger_config
from routeformer_tpu.baselines import (
    AdaptedGIMO,
    AutoBotAdapted,
    MultiModalTransformer,
)
from routeformer_tpu.models import RouteformerConfig
from routeformer_tpu.models.gps_backbone import (
    DLinear,
    GPSBackboneConfig,
    Informer,
    LinearBackboneConfig,
    LinearBaseline,
    NLinear,
    PatchTSTBackboneConfig,
    StationaryBaseline,
    Transformer,
)
from routeformer_tpu.models.routeformer import Routeformer
from routeformer_tpu.models.video_backbone import SwinV2, TimmBackboneConfig
from routeformer_tpu.optimizers import build_optimizer
from routeformer_tpu.train.checkpoints import CheckpointManager
from routeformer_tpu.train.logging import MetricsLogger
from routeformer_tpu.train.metrics import DREYEVE_QUARTILES, GEM_QUARTILES
from routeformer_tpu.train.trainer import ParallelTrainer

# --------------------------------------------------------------------------- #
# Env-var config block (reference full_comparison.py:50-150)
# --------------------------------------------------------------------------- #

DATASET = os.getenv("DATASET", "DREYEVE")
DEBUG = os.getenv("DEBUG", "0") == "1"
RESULTS_DIR = Path(os.getenv("RESULTS_DIR", Path(__file__).parent))
EPOCHS = int(os.getenv("EPOCHS", 200 if not DEBUG else 1))
INPUT_LENGTH_SECONDS = 8
TARGET_LENGTH_SECONDS = 6
MIN_PCI = float(os.getenv("MIN_PCI", 20))
OUTPUT_FPS = int(os.getenv("OUTPUT_FPS", 5))
VIDEO_FPS = 1
GAZE_FPS = 1
BATCH_SIZE = int(os.getenv("BATCH_SIZE", 16 if not DEBUG else 2))
MODEL_SET = os.getenv("MODEL_SET", "full")  # full | gps | flagship
STEP_SIZE_SECONDS = 2
USE_PATCHTST_BACKBONE = os.getenv("USE_PATCHTST_BACKBONE", "0") == "1"
LIMIT_TRAIN_BATCHES = float(os.getenv("LIMIT_TRAIN_BATCHES", 1))
# DR(eye)VE-only PCI-balanced binned sampling of the train split
# (reference full_comparison.py:93-105)
ENABLE_PCI_SPLIT = (
    DATASET == "DREYEVE" and os.getenv("ENABLE_PCI_SPLIT", "0") == "1"
)
PCI_SPLIT_N_SAMPLES_PER_BIN = int(os.getenv("PCI_SPLIT_N_SAMPLES_PER_BIN", 200))

DISCOUNTED_FACTOR = (
    {0: 0.97, 100: 0.98, 200: 0.99}
    if os.getenv("DISCOUNTED_FACTOR", "default") == "default"
    else {0: 1.0}
)

if DATASET == "DREYEVE":
    GOPRO_SCALING_FACTOR = 0.4
    FRONT_SCALING_FACTOR = 1 / 3.0
    QUARTILES = DREYEVE_QUARTILES
    DATASET_DIR = os.getenv("DREYEVE_DATASET_DIR")
else:
    GOPRO_SCALING_FACTOR = 0.1
    FRONT_SCALING_FACTOR = 0.3
    QUARTILES = GEM_QUARTILES
    DATASET_DIR = os.getenv("ROUTEFORMER_DATASET_DIR")

set_logger_config("DEBUG" if DEBUG else "ERROR")

SEQ_LEN = INPUT_LENGTH_SECONDS * OUTPUT_FPS
PRED_LEN = TARGET_LENGTH_SECONDS * OUTPUT_FPS

# --------------------------------------------------------------------------- #
# Configs (reference full_comparison.py:159-338)
# --------------------------------------------------------------------------- #

GPS_BACKBONE_CONFIG_PARAMETERS = dict(
    seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
    embed="timeF", freq="m", moving_avg=25, factor=4, distil=True,
    dropout=0.0, activation="relu", individual=False,
    d_model=832, n_heads=8, e_layers=6, d_layers=1, d_ff=832 * 4,
)
if DEBUG:
    GPS_BACKBONE_CONFIG_PARAMETERS.update(d_model=64, e_layers=2, d_ff=128)

GPS_BACKBONE_CONFIG = GPSBackboneConfig(**GPS_BACKBONE_CONFIG_PARAMETERS)
LINEAR_BACKBONE_CONFIG = LinearBackboneConfig(
    **GPS_BACKBONE_CONFIG_PARAMETERS, kernel_size=25
)
PATCHTST_BACKBONE_CONFIG = PatchTSTBackboneConfig(
    **GPS_BACKBONE_CONFIG_PARAMETERS,
    fc_dropout=0.1, head_dropout=0.0, patch_len_ratio=0.25, stride_ratio=0.125,
    padding_patch="end", revin=True, affine=False, subtract_last=False,
    decomposition=False, kernel_size=25,
)

ROUTEFORMER_CONFIG = RouteformerConfig(
    gps_backbone_config=GPS_BACKBONE_CONFIG,
    lr=1e-5, wd=1e-4,
    discount_factor=DISCOUNTED_FACTOR,
    epsilon=1.0, visual_epsilon=0.3,
    optimizer="AdamW", batch_size=BATCH_SIZE, min_pci=MIN_PCI,
    step_size=STEP_SIZE_SECONDS, epochs=EPOCHS, output_fps=OUTPUT_FPS,
    gopro_scaling_factor=GOPRO_SCALING_FACTOR,
    front_scaling_factor=FRONT_SCALING_FACTOR,
    normalize_motion=False,
    rotate_motion=DATASET == "DREYEVE",
    decoder_mode="smart",
    # COMPUTE_DTYPE=bfloat16 runs the fusion stack in bf16 (params/norms/
    # softmax stay f32) — +11% flagship step on TPU (docs/PERF.md round 1).
    # Default flipped to bfloat16 in round 5, gated by the accuracy proxy:
    # loss_ratio 1.002 vs f32 baseline, ADE delta +1.03 m — inside the
    # seed-noise band (tools/ablate_accuracy_proxy.py, variant "bf16").
    # COMPUTE_DTYPE=float32 restores the old default.
    compute_dtype=os.getenv("COMPUTE_DTYPE", "bfloat16"),
)

SWINV2_BACKBONE_CONFIG = TimmBackboneConfig(
    model_type="swinv2_base_window12to16_192to256.ms_in22k_ft_in1k"
    if not DEBUG
    else "vit_tiny_test",
    train_backbone=False,
    cache_enabled=False,
    pad_to_square=True,
)

ROUTEFORMER_CONFIG_SWINV2 = ROUTEFORMER_CONFIG.override(
    video_backbone_config=SWINV2_BACKBONE_CONFIG,
    with_video=True, video_fps=VIDEO_FPS, gaze_fps=GAZE_FPS,
    dense_prediction=True, dense_loss_ratio=0.5,
    image_embedding_size=64, view_dropout=0.6, gaze_dropout=0.2,
    motion_noise=0.0, feature_dropout=0.05,
    encoder_hidden_size=64, encoder_heads=8, encoder_layers=8,
    encoder_d_ff=64 * 4, cross_modal_decoder_heads=8,
    cross_modal_decoder_layers=2,
)
if DEBUG:
    ROUTEFORMER_CONFIG_SWINV2 = ROUTEFORMER_CONFIG_SWINV2.override(
        image_embedding_size=16, encoder_hidden_size=16, encoder_layers=2,
        encoder_d_ff=32,
    )

ROUTEFORMER_CONFIG_SWINV2_GAZE = ROUTEFORMER_CONFIG_SWINV2.override(with_gaze=True)
ROUTEFORMER_CONFIG_SWINV2_GAZE_AUTOREG = ROUTEFORMER_CONFIG_SWINV2_GAZE.override(
    autoregressive=True, autoregressive_step_size=int(4 * OUTPUT_FPS),
)
ROUTEFORMER_CONFIG_SWINV2_GAZE_WOUT_SCENE = ROUTEFORMER_CONFIG_SWINV2_GAZE.override(
    with_scene=False, gaze_dropout=0.0,
)
GIMO_CONFIG_SWINV2 = ROUTEFORMER_CONFIG_SWINV2_GAZE.override(dense_prediction=False)
MULTIMODAL_TRANSFORMER_CONFIG_SWINV2 = GIMO_CONFIG_SWINV2


def build_models(model_set: str = MODEL_SET):
    """The candidate-model dict (reference full_comparison.py:341-437)."""
    from routeformer_tpu.utils import init_on_cpu

    with init_on_cpu():
        return _build_models(model_set)


def _build_models(model_set: str):
    def rngs(i):
        return nnx.Rngs(i, dropout=1000 + i)

    # USE_PATCHTST_BACKBONE swaps the flagship GPS backbone
    # (reference full_comparison.py:154, 343-345)
    if USE_PATCHTST_BACKBONE:
        from routeformer_tpu.models.gps_backbone import PatchTST

        flagship_backbone = PatchTST
        flagship_gaze_cfg = ROUTEFORMER_CONFIG_SWINV2_GAZE.override(
            gps_backbone_config=PATCHTST_BACKBONE_CONFIG
        )
    else:
        flagship_backbone = Informer
        flagship_gaze_cfg = ROUTEFORMER_CONFIG_SWINV2_GAZE

    models = {}
    if model_set in ("full", "flagship"):
        models["Routeformer_with_video_with_gaze_swinv2"] = Routeformer(
            flagship_gaze_cfg, gps_backbone=flagship_backbone,
            video_backbone=SwinV2, rngs=rngs(0),
        )
    if model_set == "full":
        models.update(
            {
                "Routeformer_with_video_with_gaze_swinv2_autoreg_4s": Routeformer(
                    ROUTEFORMER_CONFIG_SWINV2_GAZE_AUTOREG, gps_backbone=Informer,
                    video_backbone=SwinV2, rngs=rngs(1),
                ),
                "Routeformer_with_video_with_gaze_swinv2_wout_scene": Routeformer(
                    ROUTEFORMER_CONFIG_SWINV2_GAZE_WOUT_SCENE, gps_backbone=Informer,
                    video_backbone=SwinV2, rngs=rngs(2),
                ),
                "AdaptedGIMO_swinv2": AdaptedGIMO(
                    GIMO_CONFIG_SWINV2, video_backbone=SwinV2, rngs=rngs(3)
                ),
                "MultiModalTransformer_swinv2": MultiModalTransformer(
                    MULTIMODAL_TRANSFORMER_CONFIG_SWINV2, video_backbone=SwinV2,
                    rngs=rngs(4),
                ),
                "Routeformer_with_video_swinv2": Routeformer(
                    ROUTEFORMER_CONFIG_SWINV2, gps_backbone=Informer,
                    video_backbone=SwinV2, rngs=rngs(5),
                ),
            }
        )
    if model_set in ("full", "gps"):
        models.update(
            {
                "AutoBotEgo": AutoBotAdapted(ROUTEFORMER_CONFIG, rngs=rngs(6)),
                "Routeformer_without_video_informer": Routeformer(
                    ROUTEFORMER_CONFIG, gps_backbone=Informer, rngs=rngs(7)
                ),
                "Routeformer_without_video_transformer": Routeformer(
                    ROUTEFORMER_CONFIG, gps_backbone=Transformer, rngs=rngs(8)
                ),
                "Routeformer_without_video_dlinear": Routeformer(
                    ROUTEFORMER_CONFIG.override(
                        gps_backbone_config=LINEAR_BACKBONE_CONFIG
                    ),
                    gps_backbone=DLinear, rngs=rngs(9),
                ),
                "Routeformer_without_video_nlinear": Routeformer(
                    ROUTEFORMER_CONFIG.override(
                        gps_backbone_config=LINEAR_BACKBONE_CONFIG
                    ),
                    gps_backbone=NLinear, rngs=rngs(10),
                ),
                "stationary_baseline": Routeformer(
                    ROUTEFORMER_CONFIG, gps_backbone=StationaryBaseline, rngs=rngs(11)
                ),
                "linear_baseline": Routeformer(
                    ROUTEFORMER_CONFIG, gps_backbone=LinearBaseline, rngs=rngs(12)
                ),
            }
        )
    return models


def build_data(with_video: bool, mesh=None, host_arrays: bool = False):
    """Dataset batches: real GEM/DR(eye)VE pipelines when present, synthetic
    otherwise (this container ships no recordings)."""
    if DATASET_DIR and Path(DATASET_DIR).exists():
        from routeformer_tpu.io.loader import DataLoader

        cache_dir = os.getenv(
            f"{'DREYEVE' if DATASET == 'DREYEVE' else 'ROUTEFORMER'}_DATASET_CACHE_DIR"
        )
        common = dict(
            input_length=INPUT_LENGTH_SECONDS,
            target_length=TARGET_LENGTH_SECONDS,
            step_size=STEP_SIZE_SECONDS,
            output_fps=OUTPUT_FPS,
            gopro_scaling_factor=GOPRO_SCALING_FACTOR,
            front_scaling_factor=FRONT_SCALING_FACTOR,
            with_video=with_video,
            use_cache=cache_dir is not None,
            cache_dir=cache_dir,
            # uint8 wire format: half the cache bytes + H2D payload; the
            # jitted step dequantizes on-device, bit-identical values
            # (ops/image.dequantize_videos)
            video_dtype=os.getenv("VIDEO_DTYPE", "uint8"),
            # in-RAM tier over the zstd sample cache (steady epochs skip
            # decompression); bound with MAX_MEMORY_CACHE_SIZE bytes
            use_memory_cache=os.getenv("USE_MEMORY_CACHE", "0") == "1",
            max_memory_cache_size=int(
                float(os.getenv("MAX_MEMORY_CACHE_SIZE", "100e9"))
            ),
        )
        if DATASET == "DREYEVE":
            from routeformer_tpu.io.dataset_dreyeve import DreyeveDataset

            # train uses min_pci=0, eval min_pci=MIN_PCI
            # (reference full_comparison.py:80,726,747); PCI-balanced
            # binned sampling on the train split only, which replaces
            # shuffling (reference :101-105,736-737,764)
            ds_train = DreyeveDataset(
                root_dir=DATASET_DIR, split="train", min_pci=0,
                enable_pci_split=ENABLE_PCI_SPLIT,
                pci_split_n_samples_per_bin=PCI_SPLIT_N_SAMPLES_PER_BIN,
                **common,
            )
            ds_val = DreyeveDataset(root_dir=DATASET_DIR, split="val",
                                    min_pci=MIN_PCI, **common)
        else:
            from routeformer_tpu.io.dataset import GEMDataset

            ds_train = GEMDataset(root=DATASET_DIR, split="train", min_pci=0,
                                  with_gaze=with_video, **common)
            ds_val = GEMDataset(root=DATASET_DIR, split="val", min_pci=MIN_PCI,
                                with_gaze=with_video, **common)
        # Producer-side device placement + frame-store H2D dedup: single-
        # device runs use the plain router; mesh runs use the sharded tier
        # (per-device rings + global-array assembly, MeshFrameStoreRouter)
        # so data-parallel runs keep the dedup instead of re-shipping full
        # batches. Only an active embedding cache (host-side precompute
        # consumes numpy pixels) forces host arrays.
        h2d = dict(
            to_device=not host_arrays,
            h2d_dedup=not host_arrays and os.getenv("H2D_DEDUP", "1") == "1",
            mesh=None if host_arrays else mesh,
        )
        # PCI-split draws its own balanced sample each epoch, so it
        # replaces shuffling (reference full_comparison.py:764)
        train = DataLoader(ds_train, batch_size=BATCH_SIZE,
                           shuffle=not ENABLE_PCI_SPLIT, **h2d)
        val = DataLoader(ds_val, batch_size=BATCH_SIZE, shuffle=False, **h2d)
        return train, val
    from routeformer_tpu.io.synthetic import SyntheticDataset

    n_train = 2 if DEBUG else 64
    n_val = 1 if DEBUG else 8
    train = SyntheticDataset(
        n_batches=n_train, batch_size=BATCH_SIZE, seq_len=SEQ_LEN,
        pred_len=PRED_LEN, fps=OUTPUT_FPS, with_video=with_video,
        with_gaze=with_video, frame_hw=(24, 32) if DEBUG else (54, 96), seed=1,
    )
    val = SyntheticDataset(
        n_batches=n_val, batch_size=BATCH_SIZE, seq_len=SEQ_LEN,
        pred_len=PRED_LEN, fps=OUTPUT_FPS, with_video=with_video,
        with_gaze=with_video, frame_hw=(24, 32) if DEBUG else (54, 96), seed=2,
    )
    return train, val


def main():
    models = build_models()
    with_video = MODEL_SET in ("full", "flagship")

    tx = build_optimizer(
        learning_rate=ROUTEFORMER_CONFIG.lr,
        weight_decay=ROUTEFORMER_CONFIG.wd,
        video_backbone_lr=1e-6,
        warmup_epochs=2,
        max_epochs=EPOCHS,
        gradient_clip_val=2.5,
    )
    # Mesh-parallel lockstep (the reference's DDPStrategy across all GPUs,
    # full_comparison.py:794,832): shard the batch over a `data` axis across
    # every attached device; N_MODEL_SHARDS>1 adds tensor parallelism.
    mesh = None
    n_devices = len(jax.devices())
    if n_devices > 1:
        from routeformer_tpu.parallel import make_mesh

        n_model = int(os.getenv("N_MODEL_SHARDS", "1"))
        n_data = n_devices // n_model
        if BATCH_SIZE % n_data != 0:
            raise SystemExit(
                f"BATCH_SIZE={BATCH_SIZE} must be divisible by the data-"
                f"parallel degree {n_data} (devices={n_devices}, "
                f"N_MODEL_SHARDS={n_model})"
            )
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        print(f"mesh: data={n_data} model={n_model}")

    emb_cache_on = (
        os.getenv("USE_EMBEDDING_CACHE", "0") != "0"
        and MODEL_SET == "flagship"
        and with_video
    )
    if emb_cache_on:
        # Cached runs consume frozen precomputed features: the epoch-10
        # unfreeze cannot apply (the trainer rejects the combination), so
        # the backbone stays frozen for the whole run.
        print(
            "USE_EMBEDDING_CACHE active: video backbones stay frozen for "
            "the entire run (epoch-10 unfreeze disabled)"
        )
    trainer = ParallelTrainer(
        models, tx, ROUTEFORMER_CONFIG, quartiles=QUARTILES, mesh=mesh,
        feature_cache_active=emb_cache_on,
        unfreeze_epoch=None if emb_cache_on else 10,
        # FSDP=1: shard large params + optimizer slots over the data axis
        # (ZeRO-3 memory regime) — same math, ~n_data-fold lower per-chip
        # param/optimizer HBM on eligible tensors
        fsdp=os.getenv("FSDP", "0") == "1",
    )
    ckpt = CheckpointManager(RESULTS_DIR / "checkpoints")
    metrics_logger = MetricsLogger(
        RESULTS_DIR / "logs",
        experiment=f"{DATASET.lower()}_full_comparison",
        config=ROUTEFORMER_CONFIG.to_dict(),
    )

    # Producer-side device placement + frame-store dedup runs for both
    # single-device and mesh runs (the mesh tier shards batches over the
    # data axis with per-device rings); only an active embedding cache
    # (host-side precompute consumes numpy pixels) forces host arrays.
    host_arrays_needed = emb_cache_on
    train_data, val_data = build_data(
        with_video, mesh=mesh, host_arrays=host_arrays_needed
    )

    # DR(eye)VE has one garmin view; split it into left/right halves
    # (reference full_comparison.py:534-551, ENABLE_LEFT_VIDEO_SPLIT).
    from routeformer_tpu.train.trainer import maybe_split_video

    split_video = (
        DATASET == "DREYEVE"
        and with_video
        and os.getenv("ENABLE_LEFT_VIDEO_SPLIT", "1") == "1"
        and DATASET_DIR is not None
        and Path(DATASET_DIR).exists()
    )

    # USE_EMBEDDING_CACHE (flagship set only — baselines consume pixels):
    # swap pixel streams for cached frozen-backbone feature maps, so
    # steady-state steps compile WITHOUT the video backbone (the torchcache
    # steady state, reference video_backbone/__init__.py:14-31).
    #   "1"/"host": host-side two-tier cache (RAM + zstd disk, persistent
    #               across runs) — features cross the host->device link
    #               every batch;
    #   "device":   device-resident memo keyed by pixel content — a warm
    #               batch moves zero video bytes over the link (per-run).
    precompute = None
    emb_mode = os.getenv("USE_EMBEDDING_CACHE", "0")
    if emb_mode != "0" and MODEL_SET == "flagship" and with_video:
        if emb_mode == "device" and mesh is not None:
            # per-shard device memos + global P('data') feature arrays —
            # mesh runs keep the zero-wire steady state
            from routeformer_tpu.models.video_backbone.cache import (
                MeshDeviceVideoFeaturePrecomputer,
            )

            precompute = MeshDeviceVideoFeaturePrecomputer(
                next(iter(models.values())), mesh
            )
        elif emb_mode == "device":
            from routeformer_tpu.models.video_backbone.cache import (
                DeviceVideoFeaturePrecomputer,
            )

            precompute = DeviceVideoFeaturePrecomputer(
                next(iter(models.values()))
            )
        else:
            from routeformer_tpu.models.video_backbone.cache import (
                VideoFeaturePrecomputer,
            )

            precompute = VideoFeaturePrecomputer(next(iter(models.values())))

    def prepare(batch):
        batch = maybe_split_video(batch, split_video)
        if precompute is not None:
            batch = dict(batch)
            batch["train"] = precompute(batch["train"])
            batch["target"] = precompute(batch["target"])
        return batch

    # Run the prepare stage (video split + embedding precompute) INSIDE the
    # loaders' prefetch pipeline so its host work overlaps the train step
    # instead of serializing with it. The single-device device memo is
    # thread-safe (per-call lock), so it defaults to two pipelined
    # producers; the host cache and the mesh memo keep one producer
    # (sequential stage, still off the consumer thread). LOADER_PRODUCERS
    # overrides.
    from routeformer_tpu.io.loader import DataLoader

    # Pipelined producers only when the device memo is ACTUALLY active
    # (precompute set): gating on the raw env value alone would request
    # producers=2 for non-flagship sets whose loaders still run the
    # h2d_dedup tier — a configuration set_batch_stage rejects.
    default_producers = (
        2
        if precompute is not None and emb_mode == "device" and mesh is None
        else 1
    )
    producers = int(os.getenv("LOADER_PRODUCERS", str(default_producers)))
    for data in (train_data, val_data):
        if isinstance(data, DataLoader):
            data.set_batch_stage(prepare, producers=producers)

    def iter_prepared(data, epoch, skip=0):
        """Batches with `prepare` applied exactly once (loader-side when
        the source is a DataLoader, else here)."""
        if isinstance(data, DataLoader):
            yield from iter_batches(data, epoch, skip)
        else:
            for b in iter_batches(data, epoch, skip):
                yield prepare(b)

    def iter_batches(data, epoch, skip=0):
        if hasattr(data, "set_epoch"):  # DataLoader
            data.set_epoch(epoch, start_batch=skip)
            yield from data
        else:  # indexable synthetic dataset of pre-batched items
            for i in range(skip, len(data)):
                yield data[i]

    max_train_batches = (
        int(len(train_data) * LIMIT_TRAIN_BATCHES)
        if LIMIT_TRAIN_BATCHES < 1
        else None
    )

    # RESUME=1 restores the latest full snapshot (exact mid-epoch resume:
    # params + optimizer state + input-pipeline position) when one exists,
    # else each model's best checkpoint, continuing from the epoch after
    # the newest (the resume path the reference lacks). SAVE_EVERY_STEPS>0
    # writes the full snapshot every N train steps.
    start_epoch, start_batch = 0, 0
    save_every = int(os.getenv("SAVE_EVERY_STEPS", "0"))
    if os.getenv("RESUME", "0") == "1":
        latest = ckpt.restore_latest(trainer)
        if latest is not None:
            start_epoch, start_batch = latest
            print(f"resumed latest snapshot: epoch {start_epoch} batch {start_batch}")
        else:
            start_epoch = ckpt.restore_all(trainer)
            print(f"resumed from best checkpoints at epoch {start_epoch}")

    for epoch in range(start_epoch, EPOCHS):
        trainer.epoch = epoch
        skip = start_batch if epoch == start_epoch else 0
        for j, batch in enumerate(iter_prepared(train_data, epoch, skip)):
            i = skip + j
            if max_train_batches is not None and i >= max_train_batches:
                break
            metrics = trainer.training_step(batch)
            if i % 10 == 0:
                metrics_logger.log(metrics, epoch * len(train_data) + i, "train")
            if save_every and (i + 1) % save_every == 0:
                ckpt.save_latest(trainer, epoch, next_batch=i + 1)
        # Epoch-level aggregation: per-sample arrays accumulate over every
        # val batch and are bucketed once (reference full_comparison.py:
        # 645-651 sync_dist epoch reduction) — NOT last-batch-wins.
        val_metrics = trainer.evaluate(iter_prepared(val_data, epoch), "val")
        metrics_logger.log(val_metrics, epoch, "val")
        ckpt.maybe_save(trainer, val_metrics, epoch)
        if save_every:
            ckpt.save_latest(trainer, epoch + 1, next_batch=0)
        print(
            f"epoch {epoch}: "
            + ", ".join(
                f"{name}={float(val_metrics.get(f'val_{name}_ade', np.nan)):.3f}"
                for name in list(models)[:3]
            )
        )
    metrics_logger.close()
    print("best:", ckpt.best)


if __name__ == "__main__":
    main()
