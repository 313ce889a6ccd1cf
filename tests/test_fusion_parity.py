"""FULL flagship fusion-path forward parity: JAX Routeformer (video+gaze)
vs a hand-built torch twin with identical weights.

Round-2 VERDICT item #1: the GPS-only full-model parity test
(test_routeformer_parity.py) leaves the flagship's actual risk surface
unverified — frame encoding, fps-subsample zero-scatter, gaze
``PerceiveDecoder`` wiring, view embeddings, output-query tokens and the
dense split. This test covers that surface end-to-end against reference
semantics (``/root/reference/routeformer/models/routeformer.py:254-395,
397-533`` + ``models/cross_modal_transformer.py:332-503``):

- tiny SwinV2 backbone (the timm-named twin from test_swin_parity, loaded
  through ``load_timm_swin``);
- frame/video/gaze ``PerceiveEncoder`` stacks + the gaze
  ``PerceiveDecoder`` (Q=downsampled gaze positions, KV=front-video
  features, ``mix=False``), twinned module-by-module with flax-matching
  names so ``load_torch_state_dict(fuzzy=False)`` maps every parameter;
- per-view additive embeddings + the output-query tokens
  (zeros + video_output_embedding) appended before the video encoder;
- fps subsampling (``arange(T-1, 0, -rel)`` flipped) and the zero-scatter
  back onto the output-fps timeline;
- motion features -> Informer (smart decoder, distil) -> cumsum
  integration, with the dense visual-feature split of ``postprocess_batch``.

ProbSparse is made exhaustive (factor so large that ``u == L`` for every
attention in the model — fusion modules' hardcoded ``factor=5`` is
overridden post-build): with all queries selected, top-u attention reduces
EXACTLY to dense (causal) attention regardless of the key-sampling rng, so
the torch twin uses dense attention and the comparison is deterministic.
Dropout is off (eval mode). Covered configs: video+gaze and video-only.
"""

import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F
from flax import nnx

from routeformer_tpu.models import RouteformerConfig
from routeformer_tpu.models.gps_backbone import GPSBackboneConfig, Informer
from routeformer_tpu.models.layers.attention import ProbAttention
from routeformer_tpu.models.routeformer import Routeformer
from routeformer_tpu.models.video_backbone import (
    SwinV2Backbone,
    TimmBackboneConfig,
)
from routeformer_tpu.models.video_backbone.convert import (
    load_timm_swin,
    load_torch_state_dict,
)

from test_swin_parity import IMG as SWIN_IMG, TorchSwinV2

# ---- tiny flagship geometry -------------------------------------------- #
B = 2
SEQ_LEN, PRED_LEN = 8, 6
T_VIDEO = SEQ_LEN          # video timeline == output-fps timeline
GAZE_LEN = 40
OUTPUT_FPS, VIDEO_FPS, GAZE_FPS = 5, 1, 1   # relative fps 5 -> 2 frames/view

IMAGE_EMB = 16             # == ENC_HIDDEN (flagship invariant: 64 == 64)
ENC_HIDDEN = 16
ENC_HEADS, ENC_LAYERS, ENC_D_FF = 4, 2, 32
CM_HEADS, CM_LAYERS = 4, 2
FUSION_D_MODEL = 128       # PerceiveEncoder/Decoder internal width (default)

GPS_D_MODEL, GPS_HEADS, E_LAYERS, D_LAYERS, GPS_D_FF = 32, 4, 2, 1, 64
FACTOR = 1000              # u = min(factor*ceil(ln L), L) = L everywhere

SWIN_FEAT_C = 32           # tiny swin: embed 16, 2 stages -> dim 32, 8x8 map

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


# ------------------------------------------------------------------------- #
# torch twins of the attention / encoder-decoder plumbing (dense == the
# exhaustive ProbSparse; names mirror the flax paths)
# ------------------------------------------------------------------------- #


class TwinAttentionLayer(nn.Module):
    def __init__(self, d_model, n_heads, causal, mix=False):
        super().__init__()
        self.query_projection = nn.Linear(d_model, d_model)
        self.key_projection = nn.Linear(d_model, d_model)
        self.value_projection = nn.Linear(d_model, d_model)
        self.out_projection = nn.Linear(d_model, d_model)
        self.n_heads = n_heads
        self.causal = causal
        self.mix = mix

    def forward(self, q_in, k_in, v_in):
        b, l, _ = q_in.shape
        s = k_in.shape[1]
        h = self.n_heads
        q = self.query_projection(q_in).view(b, l, h, -1).permute(0, 2, 1, 3)
        k = self.key_projection(k_in).view(b, s, h, -1).permute(0, 2, 1, 3)
        v = self.value_projection(v_in).view(b, s, h, -1).permute(0, 2, 1, 3)
        scores = (q @ k.transpose(-2, -1)) / math.sqrt(q.shape[-1])
        if self.causal:
            mask = torch.triu(torch.ones(l, s, dtype=torch.bool), diagonal=1)
            scores = scores.masked_fill(mask, float("-inf"))
        out = scores.softmax(-1) @ v  # (B, H, L, D)
        if self.mix:
            out = out.reshape(b, l, -1)  # head-major merge quirk
        else:
            out = out.permute(0, 2, 1, 3).reshape(b, l, -1)
        return self.out_projection(out)


class TwinEncoderLayer(nn.Module):
    def __init__(self, d_model, n_heads, d_ff, activation, mix=False):
        super().__init__()
        self.attention = TwinAttentionLayer(d_model, n_heads, causal=False, mix=mix)
        self.ff1 = nn.Linear(d_model, d_ff)
        self.ff2 = nn.Linear(d_ff, d_model)
        self.norm1 = nn.LayerNorm(d_model, eps=1e-6)
        self.norm2 = nn.LayerNorm(d_model, eps=1e-6)
        self.act = F.relu if activation == "relu" else F.gelu

    def forward(self, x):
        x = x + self.attention(x, x, x)
        y = x = self.norm1(x)
        y = self.ff2(self.act(self.ff1(y)))
        return self.norm2(x + y)


class TwinDecoderLayer(nn.Module):
    def __init__(self, d_model, n_heads, d_ff, activation, mix, cross_mix=False):
        super().__init__()
        self.self_attention = TwinAttentionLayer(
            d_model, n_heads, causal=True, mix=mix
        )
        self.cross_attention = TwinAttentionLayer(
            d_model, n_heads, causal=False, mix=cross_mix
        )
        self.ff1 = nn.Linear(d_model, d_ff)
        self.ff2 = nn.Linear(d_ff, d_model)
        self.norm1 = nn.LayerNorm(d_model, eps=1e-6)
        self.norm2 = nn.LayerNorm(d_model, eps=1e-6)
        self.norm3 = nn.LayerNorm(d_model, eps=1e-6)
        self.act = F.relu if activation == "relu" else F.gelu

    def forward(self, x, cross):
        x = self.norm1(x + self.self_attention(x, x, x))
        x = x + self.cross_attention(x, cross, cross)
        y = x = self.norm2(x)
        y = self.ff2(self.act(self.ff1(y)))
        return self.norm3(x + y)


def _sinusoidal_pe(length, d_model):
    position = torch.arange(length, dtype=torch.float32).unsqueeze(1)
    div = torch.exp(
        torch.arange(0, d_model, 2, dtype=torch.float32)
        * -(math.log(10000.0) / d_model)
    )
    pe = torch.zeros(length, d_model)
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    return pe.unsqueeze(0)


class TwinTokenEmbedding(nn.Module):
    """Circular conv token embedding; the cross-modal variant keeps torch's
    default conv bias (reference cross_modal_transformer.py:356-361)."""

    def __init__(self, c_in, d_model, bias):
        super().__init__()
        self.conv = nn.Conv1d(
            c_in, d_model, 3, padding=1, padding_mode="circular", bias=bias
        )

    def forward(self, x):  # (B, L, C)
        return self.conv(x.permute(0, 2, 1)).permute(0, 2, 1)


class TwinPerceiveEncoder(nn.Module):
    """Reference PerceiveEncoder (cross_modal_transformer.py:372-433) with
    exhaustive (== dense) ProbSparse self-attention."""

    def __init__(self, in_ch, out_ch, out_len, n_heads, layers, d_ff):
        super().__init__()
        self.pred_len = out_len
        self.value_embedding = TwinTokenEmbedding(in_ch, FUSION_D_MODEL, bias=True)
        self.layers = nn.ModuleList(
            [
                TwinEncoderLayer(FUSION_D_MODEL, n_heads, d_ff, "gelu")
                for _ in range(layers)
            ]
        )
        self.norm = nn.LayerNorm(FUSION_D_MODEL, eps=1e-6)
        self.projection = nn.Linear(FUSION_D_MODEL, out_ch)

    def forward(self, x):
        h = self.value_embedding(x) + _sinusoidal_pe(x.shape[1], FUSION_D_MODEL)
        for layer in self.layers:
            h = layer(h)
        h = self.projection(self.norm(h))
        return h[:, -self.pred_len :, :]


class TwinPerceiveDecoder(nn.Module):
    """Reference PerceiveDecoder (cross_modal_transformer.py:436-503):
    query stream token-embedded, causal self-attn + dense cross-attn."""

    def __init__(self, query_ch, value_ch, out_ch, out_len, n_heads, layers, d_ff, mix):
        super().__init__()
        self.pred_len = out_len
        d_model = value_ch
        self.value_embedding = TwinTokenEmbedding(query_ch, d_model, bias=True)
        self.decoder = nn.Module()
        self.decoder.layers = nn.ModuleList(
            [
                TwinDecoderLayer(d_model, n_heads, d_ff, "gelu", mix)
                for _ in range(layers)
            ]
        )
        self.decoder.norm = nn.LayerNorm(d_model, eps=1e-6)
        self.projection = nn.Linear(d_model, out_ch)

    def forward(self, x_enc, x_dec):
        h = self.value_embedding(x_dec) + _sinusoidal_pe(
            x_dec.shape[1], x_enc.shape[-1]
        )
        for layer in self.decoder.layers:
            h = layer(h, x_enc)
        return self.projection(self.decoder.norm(h))[:, -self.pred_len :, :]


# ------------------------------------------------------------------------- #
# torch Informer twin (parameterized version of test_routeformer_parity's)
# ------------------------------------------------------------------------- #


class TwinConvLayer(nn.Module):
    def __init__(self, d_model):
        super().__init__()
        self.conv = nn.Conv1d(d_model, d_model, 3, padding=2, padding_mode="circular")
        self.norm = nn.BatchNorm1d(d_model)

    def forward(self, x):
        x = self.conv(x.permute(0, 2, 1))
        x = F.elu(self.norm(x))
        x = F.max_pool1d(x, 3, stride=2, padding=1)
        return x.permute(0, 2, 1)


class TwinDataEmbedding(nn.Module):
    def __init__(self, c_in, d_model):
        super().__init__()
        self.d_model = d_model
        self.value_embedding = nn.Module()
        self.value_embedding.conv = nn.Conv1d(
            c_in, d_model, 3, padding=1, padding_mode="circular", bias=False
        )
        self.temporal_embedding = nn.Module()
        self.temporal_embedding.linear = nn.Linear(1, d_model, bias=False)

    def forward(self, x, x_mark):
        val = self.value_embedding.conv(x.permute(0, 2, 1)).permute(0, 2, 1)
        tmp = self.temporal_embedding.linear(x_mark)
        return val + tmp + _sinusoidal_pe(x.shape[1], self.d_model)


class TwinInformer(nn.Module):
    def __init__(self, enc_in, c_out, pred_len):
        super().__init__()
        self.pred_len = pred_len
        d = GPS_D_MODEL
        self.enc_embedding = TwinDataEmbedding(enc_in, d)
        self.dec_embedding = TwinDataEmbedding(enc_in, d)
        self.encoder = nn.Module()
        # gps-backbone flavor: every AttentionLayer (encoder self, decoder
        # self AND cross) is mix=True (reference SelfAttentionFamily.py:165
        # skips the head transpose-back; Informer.py passes mix throughout)
        self.encoder.attn_layers = nn.ModuleList(
            [
                TwinEncoderLayer(d, GPS_HEADS, GPS_D_FF, "relu", mix=True)
                for _ in range(E_LAYERS)
            ]
        )
        self.encoder.conv_layers = nn.ModuleList(
            [TwinConvLayer(d) for _ in range(E_LAYERS - 1)]
        )
        self.encoder.norm = nn.LayerNorm(d, eps=1e-6)
        self.decoder = nn.Module()
        self.decoder.layers = nn.ModuleList(
            [
                TwinDecoderLayer(
                    d, GPS_HEADS, GPS_D_FF, "relu", mix=True, cross_mix=True
                )
                for _ in range(D_LAYERS)
            ]
        )
        self.decoder.norm = nn.LayerNorm(d, eps=1e-6)
        self.decoder.projection = nn.Linear(d, c_out)

    def forward(self, x):
        b, l, _ = x.shape
        marks_enc = torch.arange(l, dtype=torch.float32).view(1, l, 1).expand(b, l, 1)
        x_dec = torch.cat([x, x[:, -1:, :].repeat(1, self.pred_len, 1)], 1)
        ld = l + self.pred_len
        marks_dec = (
            torch.arange(ld, dtype=torch.float32).view(1, ld, 1).expand(b, ld, 1)
        )

        h = self.enc_embedding(x, marks_enc)
        for attn, conv in zip(self.encoder.attn_layers, self.encoder.conv_layers):
            h = conv(attn(h))
        h = self.encoder.attn_layers[-1](h)
        h = self.encoder.norm(h)

        d = self.dec_embedding(x_dec, marks_dec)
        for layer in self.decoder.layers:
            d = layer(d, h)
        d = self.decoder.projection(self.decoder.norm(d))
        return d[:, -self.pred_len :, :]


# ------------------------------------------------------------------------- #
# the full flagship twin
# ------------------------------------------------------------------------- #


def _median_downsample_torch(x, target_length):
    """Reference utils/filter.py:5-52 (torch lower-median windows)."""
    b, t, c = x.shape
    stride = t // target_length
    out = torch.empty((b, target_length, c), dtype=x.dtype)
    for i in range(target_length):
        out[:, i] = x[:, i * stride : i * stride + stride].median(dim=1).values
    return out


def _fps_indices(length, relative_fps):
    idx = torch.arange(length - 1, 0, -relative_fps).long()
    return torch.flip(idx, dims=[0])


class TwinRouteformer(nn.Module):
    """Reference flagship forward (routeformer.py:124-533) in torch."""

    def __init__(self, with_gaze):
        super().__init__()
        self.with_gaze = with_gaze
        self.video_backbone = TorchSwinV2()
        self.frame_encoder = TwinPerceiveEncoder(
            SWIN_FEAT_C, IMAGE_EMB, 1, ENC_HEADS, ENC_LAYERS, ENC_D_FF
        )
        self.left_video_embedding = nn.Parameter(torch.randn(1, 1, IMAGE_EMB))
        self.right_video_embedding = nn.Parameter(torch.randn(1, 1, IMAGE_EMB))
        self.gaze_video_embedding = nn.Parameter(torch.randn(1, 1, IMAGE_EMB))
        self.video_output_embedding = nn.Parameter(torch.randn(1, 1, IMAGE_EMB))
        self.video_encoder = TwinPerceiveEncoder(
            IMAGE_EMB, ENC_HIDDEN, SEQ_LEN, ENC_HEADS, ENC_LAYERS, ENC_D_FF
        )
        if with_gaze:
            self.gaze_encoder = TwinPerceiveEncoder(
                2, ENC_HIDDEN, SEQ_LEN, ENC_HEADS, ENC_LAYERS, ENC_D_FF
            )
            self.gaze_video_decoder = TwinPerceiveDecoder(
                ENC_HIDDEN, ENC_HIDDEN, ENC_HIDDEN, SEQ_LEN,
                CM_HEADS, CM_LAYERS, ENC_D_FF, mix=False,
            )
        enc_in = 5 + ENC_HIDDEN
        c_out = 2 + IMAGE_EMB  # dense prediction split
        self.gps_backbone = TwinInformer(enc_in, c_out, PRED_LEN)

    def _encode_frames(self, frames):
        """(N, H, W, 3) [0,1] -> (N, IMAGE_EMB): backbone feature map ->
        tokens + the -1 sentinel token -> frame encoder (reference
        routeformer.py:463-491)."""
        n = frames.shape[0]
        x = (frames - torch.from_numpy(IMAGENET_MEAN)) / torch.from_numpy(
            IMAGENET_STD
        )
        feats = self.video_backbone(x)  # (N, 8, 8, C) channel-last twin
        tokens = feats.reshape(n, -1, feats.shape[-1])
        tokens = torch.cat([tokens, -torch.ones_like(tokens[:, :1, :])], dim=1)
        return self.frame_encoder(tokens).reshape(n, IMAGE_EMB)

    @staticmethod
    def _scatter(feats, batch_size, length, indices):
        feats = feats.view(batch_size, -1, feats.shape[-1])
        full = torch.zeros(batch_size, length, feats.shape[-1])
        full[:, indices] = feats
        return full

    def forward(self, gps, left, right, front=None, gaze=None):
        # motion features (reference routeformer.py:204-252, 254-292)
        motion = gps[:, 1:] - gps[:, :-1]
        motion = F.pad(motion, (0, 0, 1, 0))
        angle = torch.atan2(motion[..., 1], motion[..., 0]).unsqueeze(-1)
        norm = motion.norm(dim=-1, keepdim=True)
        normalized_angle = (angle - angle[:, :1]) / math.pi
        accel = F.pad(norm[:, 1:] - norm[:, :-1], (0, 0, 1, 0))

        # scene views (reference routeformer.py:397-461)
        rel = OUTPUT_FPS // VIDEO_FPS
        t = left.shape[1]
        idx = _fps_indices(t, rel)
        bsz = left.shape[0]
        left_f = self._encode_frames(left[:, idx].flatten(0, 1))
        right_f = self._encode_frames(right[:, idx].flatten(0, 1))
        visual = [
            self._scatter(left_f, bsz, t, idx) + self.left_video_embedding,
            self._scatter(right_f, bsz, t, idx) + self.right_video_embedding,
        ]

        if self.with_gaze:
            # front camera + gaze decode (reference routeformer.py:298-329,
            # 493-533)
            rel_g = OUTPUT_FPS // GAZE_FPS
            tg = front.shape[1]
            idx_g = _fps_indices(tg, rel_g)
            front_f = self._encode_frames(front[:, idx_g].flatten(0, 1))
            gaze_video_features = self._scatter(front_f, bsz, tg, idx_g)
            in_len = gaze_video_features.shape[1]
            gaze_positions = _median_downsample_torch(gaze, SEQ_LEN)
            gaze_positions = self.gaze_encoder(gaze_positions)
            gaze_features = self.gaze_video_decoder(
                gaze_video_features, gaze_positions
            )[:, :in_len]
            visual.append(gaze_features + self.gaze_video_embedding)

        visual = torch.cat(
            [*visual, torch.zeros_like(visual[-1]) + self.video_output_embedding],
            dim=1,
        )
        visual = self.video_encoder(visual)  # (B, SEQ_LEN, ENC_HIDDEN)

        x = torch.cat([motion, normalized_angle, norm, accel, visual], -1)
        out = self.gps_backbone(x)  # (B, PRED_LEN, 2 + IMAGE_EMB)
        pred = gps[:, -1:] + torch.cumsum(out[..., :2], dim=1)
        dense = out[..., 2 : 2 + IMAGE_EMB]
        return pred, dense


# ------------------------------------------------------------------------- #
# weight transfer
# ------------------------------------------------------------------------- #


def _stack_scanned_encoder(sd, prefix, n_layers):
    """Rewrite torch ``{prefix}.layers.{i}.X`` keys into the flax scanned
    layout ``{prefix}.stacked_layers.X`` (leading depth axis, Linear weights
    pre-transposed to flax (in, out))."""
    grouped = {}
    for key in [k for k in sd if k.startswith(f"{prefix}.layers.")]:
        arr = sd.pop(key)
        i, rest = key[len(f"{prefix}.layers.") :].split(".", 1)
        grouped.setdefault(rest, {})[int(i)] = arr
    for rest, items in grouped.items():
        arrs = [items[i] for i in range(n_layers)]
        if rest.endswith(".weight") and arrs[0].ndim == 2:
            arrs = [a.T for a in arrs]
        sd[f"{prefix}.stacked_layers.{rest}"] = torch.stack(
            [torch.as_tensor(a) for a in arrs]
        )


def _build_jax_model(with_gaze):
    gps_cfg = GPSBackboneConfig(
        seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
        d_model=GPS_D_MODEL, n_heads=GPS_HEADS, e_layers=E_LAYERS,
        d_layers=D_LAYERS, d_ff=GPS_D_FF, factor=FACTOR,
        dropout=0.0, activation="relu", distil=True,
        embed="timeF", freq="m",
    )
    cfg = RouteformerConfig(
        gps_backbone_config=gps_cfg,
        video_backbone_config=TimmBackboneConfig(
            model_type="swinv2_parity_test", cache_enabled=False,
            compute_dtype="float32", pad_to_square=False,
        ),
        decoder_mode="smart",
        with_video=True, with_gaze=with_gaze,
        dense_prediction=True, dense_loss_ratio=0.5,
        discount_factor={0: 0.97}, epsilon=1.0, visual_epsilon=0.3,
        normalize_motion=False, rotate_motion=False,
        image_embedding_size=IMAGE_EMB, encoder_hidden_size=ENC_HIDDEN,
        encoder_heads=ENC_HEADS, encoder_layers=ENC_LAYERS,
        encoder_d_ff=ENC_D_FF,
        cross_modal_decoder_heads=CM_HEADS,
        cross_modal_decoder_layers=CM_LAYERS,
        feature_dropout=0.0, view_dropout=0.0, gaze_dropout=0.0,
        motion_noise=0.0,
        output_fps=OUTPUT_FPS, video_fps=VIDEO_FPS, gaze_fps=GAZE_FPS,
    )
    model = Routeformer(
        cfg, gps_backbone=Informer, video_backbone=SwinV2Backbone,
        rngs=nnx.Rngs(0, dropout=1),
    )
    # exhaustive ProbSparse everywhere (fusion modules hardcode factor=5)
    for _, module in nnx.iter_modules(model):
        if isinstance(module, ProbAttention):
            module.factor = FACTOR
    model.eval()
    return model


def _load_twin_into_jax(model, twin):
    """Load every twin parameter into the JAX model; assert full coverage."""
    # 1) backbone via the timm-layout converter (scan-stacked pairs)
    swin_sd = {
        k[len("video_backbone.") :]: v
        for k, v in twin.state_dict().items()
        if k.startswith("video_backbone.")
    }
    n_swin = load_timm_swin(model.video_backbone, swin_sd)
    assert n_swin > 0

    # 2) everything else via the generic name-matched loader
    sd = {
        k: v
        for k, v in twin.state_dict().items()
        if not k.startswith("video_backbone.")
    }
    for enc in ("frame_encoder", "video_encoder", "gaze_encoder"):
        if any(k.startswith(enc + ".") for k in sd):
            _stack_scanned_encoder(sd, enc, ENC_LAYERS)
    n_loaded, n_total = load_torch_state_dict(model, sd, fuzzy=False)

    n_backbone = len(
        nnx.to_flat_state(
            nnx.state(model.video_backbone, (nnx.Param, nnx.BatchStat))
        )
    )
    assert n_loaded == n_total - n_backbone, (
        f"fusion/backbone-free coverage {n_loaded}/{n_total - n_backbone}"
    )


def _random_inputs(rng, with_gaze):
    gps = np.cumsum(rng.randn(B, SEQ_LEN, 2).astype(np.float32) * 0.5, axis=1)
    left = rng.uniform(size=(B, T_VIDEO, SWIN_IMG, SWIN_IMG, 3)).astype(np.float32)
    right = rng.uniform(size=(B, T_VIDEO, SWIN_IMG, SWIN_IMG, 3)).astype(np.float32)
    batch = {
        "gps": jnp.asarray(gps),
        "left_video": jnp.asarray(left),
        "right_video": jnp.asarray(right),
    }
    t_args = [torch.from_numpy(gps), torch.from_numpy(left), torch.from_numpy(right)]
    if with_gaze:
        front = rng.uniform(size=(B, T_VIDEO, SWIN_IMG, SWIN_IMG, 3)).astype(
            np.float32
        )
        gaze = rng.uniform(size=(B, GAZE_LEN, 2)).astype(np.float32)
        batch["front_video"] = jnp.asarray(front)
        batch["gaze"] = jnp.asarray(gaze)
        t_args += [torch.from_numpy(front), torch.from_numpy(gaze)]
    return batch, t_args


def _run_parity(with_gaze):
    torch.manual_seed(0)
    twin = TwinRouteformer(with_gaze).eval()
    with torch.no_grad():  # non-trivial biases/norm params
        for p in twin.parameters():
            if p.ndim == 1:
                p.add_(0.05 * torch.randn_like(p))

    model = _build_jax_model(with_gaze)
    _load_twin_into_jax(model, twin)

    rng = np.random.RandomState(7)
    batch, t_args = _random_inputs(rng, with_gaze)

    with torch.no_grad():
        t_gps, t_dense = twin(*t_args)

    j_gps, j_dense = model(batch)
    j_gps, j_dense = np.asarray(j_gps), np.asarray(j_dense)

    assert j_gps.shape == tuple(t_gps.shape) == (B, PRED_LEN, 2)
    assert j_dense.shape == tuple(t_dense.shape) == (B, PRED_LEN, IMAGE_EMB)
    np.testing.assert_allclose(j_gps, t_gps.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(j_dense, t_dense.numpy(), atol=1e-4, rtol=1e-4)


def test_flagship_fusion_parity_video_gaze():
    """Full video+gaze flagship forward, identical weights, atol 1e-4."""
    _run_parity(with_gaze=True)


def test_flagship_fusion_parity_video_only():
    """Video-only config: no gaze stream; output queries follow the right
    view (reference preprocess_batch uses zeros_like(visual[-1]))."""
    _run_parity(with_gaze=False)
