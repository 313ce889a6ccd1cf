"""Multiwavelet (MWT) layers for FEDformer (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/layers/MultiWaveletCorrelation.py``:
``MultiWaveletTransform`` (:14), ``MultiWaveletCross`` (:63),
``FourierCrossAttentionW`` (:249), ``sparseKernelFT1d`` (:307),
``MWT_CZ1d`` (:340) and the Legendre/Chebyshev filter builders
(``get_phi_psi``/``get_filter``, :452-651).

Filter construction is redesigned: the reference tabulates the multiwavelet
bases with sympy symbolic polynomial expansion. Here the same orthonormal
bases are built with plain numpy power-basis polynomials and *exact*
polynomial integration for the Gram-Schmidt inner products (the quantities
involved are polynomial integrals over [0, 1/2] / [1/2, 1], so exact
integration reproduces the reference's quadrature values):

- ``phi_i(x) = sqrt(2i+1) P_i(2x - 1)`` — shifted-Legendre orthonormal basis
  of L2[0, 1];
- ``psi`` — Gram-Schmidt of ``sqrt(2) phi_i(2x)`` against {phi_j} and the
  previously built psi_j, split into its [0, 1/2] (psi1) and [1/2, 1]
  (psi2) restrictions;
- filter matrices H0/H1/G0/G1 from the two-scale relations, exact integrals
  for the Legendre base and Gauss-Chebyshev quadrature for the Chebyshev
  base (matching the reference's quadrature semantics there).

Complex Fourier weights are stored as separate real/imag float32 params
(TPU-friendly; optimizers see real pytrees).
"""

import math
from functools import lru_cache
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

Poly = np.polynomial.Polynomial


def _chebyshev_phi(i: int) -> Poly:
    """Chebyshev-base phi_i, normalized as the reference does
    (2/sqrt(pi) T_i(2x-1); sqrt(2/pi) for i=0)."""
    t_coeffs = np.polynomial.chebyshev.cheb2poly(np.eye(i + 1)[i])
    p = Poly(t_coeffs)(Poly([-1.0, 2.0]))
    scale = math.sqrt(2 / math.pi) if i == 0 else 2 / math.sqrt(math.pi)
    return scale * p


def _clean(arr: np.ndarray, tol: float = 1e-8) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float64)
    arr[np.abs(arr) < tol] = 0.0
    return arr


def _phi_eval(i: int, x: np.ndarray) -> np.ndarray:
    """Orthonormal shifted Legendre phi_i(x) = sqrt(2i+1) P_i(2x-1),
    evaluated via the stable Legendre recurrence (Clenshaw), NOT the
    ill-conditioned power basis."""
    c = np.zeros(i + 1)
    c[i] = 1.0
    return math.sqrt(2 * i + 1) * np.polynomial.legendre.legval(2 * x - 1, c)


@lru_cache(maxsize=None)
def legendre_filters(k: int):
    """H0, H1, G0, G1, PHI0, PHI1 for the Legendre base.

    Numerically-sound construction (the reference's monomial-basis
    Gram-Schmidt — MultiWaveletCorrelation.py:452-523 — loses orthogonality
    badly at its own default k=8):

    - H filters from the two-scale relation, computed by Gauss-Legendre
      quadrature (exact for these polynomial degrees) with stable
      recurrence evaluation;
    - G filters as an orthonormal completion of the H rows in R^{2k}
      (any such completion is a valid orthonormal multiwavelet bank: the
      wavelets span V1 ⊖ V0). The completion is deterministic (SVD with a
      fixed sign convention).
    """
    n_quad = 2 * k + 2
    nodes, weights = np.polynomial.legendre.leggauss(n_quad)
    x = (nodes + 1) / 2  # map to [0, 1]
    w = weights / 2

    H0 = np.zeros((k, k))
    H1 = np.zeros((k, k))
    s2 = math.sqrt(2)
    for i in range(k):
        pi_half = _phi_eval(i, x / 2)
        pi_hshift = _phi_eval(i, (x + 1) / 2)
        for j in range(k):
            pj = _phi_eval(j, x)
            H0[i, j] = float((w * pi_half * pj).sum()) / s2
            H1[i, j] = float((w * pi_hshift * pj).sum()) / s2

    # Orthonormal completion: rows of [H0 H1] are orthonormal; the G rows
    # span the orthogonal complement.
    m_h = np.concatenate([H0, H1], axis=1)  # (k, 2k)
    _, _, vt = np.linalg.svd(m_h, full_matrices=True)
    comp = vt[k:]  # (k, 2k), orthonormal, orthogonal to H rows
    # Fix signs deterministically: make the largest-|entry| of each row +.
    signs = np.sign(comp[np.arange(k), np.abs(comp).argmax(axis=1)])
    comp = comp * signs[:, None]
    G0 = comp[:, :k]
    G1 = comp[:, k:]

    return (
        _clean(H0), _clean(H1), _clean(G0), _clean(G1),
        np.eye(k), np.eye(k),
    )


@lru_cache(maxsize=None)
def chebyshev_filters(k: int):
    """Chebyshev-base filters via Gauss-Chebyshev quadrature (reference
    semantics — the quadrature there is applied to unweighted integrals)."""
    k_use = 2 * k
    # roots of T_{k_use}(2x - 1)
    theta = (2 * np.arange(1, k_use + 1) - 1) * math.pi / (2 * k_use)
    y = np.cos(theta)
    x_m = (y + 1) / 2
    wm = math.pi / k_use / 2

    phi = [_chebyshev_phi(i) for i in range(k)]
    phi2 = [math.sqrt(2) * p(Poly([0.0, 2.0])) for p in phi]

    def on_interval(p, lo, hi):
        def f(x):
            x = np.asarray(x)
            vals = p(x)
            return np.where((x < lo) | (x > hi), 0.0, vals)

        return f

    phi_f = [on_interval(p, 0.0, 1.0) for p in phi]
    phi2_f = [on_interval(p, 0.0, 0.5) for p in phi2]

    psi1_f, psi2_f = [], []
    psi1_p, psi2_p = [], []
    for ki in range(k):
        p1 = phi2[ki]
        p2 = Poly([0.0])
        for i in range(k):
            proj = float((wm * phi_f[i](x_m) * phi2_f[ki](x_m)).sum())
            p1 = p1 - proj * phi[i]
            p2 = p2 - proj * phi[i]
        for j in range(ki):
            proj = float((wm * psi1_f[j](x_m) * phi2_f[ki](x_m)).sum())
            p1 = p1 - proj * psi1_p[j]
            p2 = p2 - proj * psi2_p[j]
        f1 = on_interval(p1, 0.0, 0.5)
        f2 = on_interval(p2, 0.5 + 1e-16, 1.0)
        norm = math.sqrt(
            float((wm * f1(x_m) ** 2).sum()) + float((wm * f2(x_m) ** 2).sum())
        )
        psi1_p.append(p1 / norm)
        psi2_p.append(p2 / norm)
        psi1_f.append(on_interval(p1 / norm, 0.0, 0.5 + 1e-16))
        psi2_f.append(on_interval(p2 / norm, 0.5 + 1e-16, 1.0))

    def psi(i, x):
        x = np.asarray(x)
        return np.where(x <= 0.5, psi1_f[i](x), psi2_f[i](x))

    H0 = np.zeros((k, k))
    H1 = np.zeros((k, k))
    G0 = np.zeros((k, k))
    G1 = np.zeros((k, k))
    PHI0 = np.zeros((k, k))
    PHI1 = np.zeros((k, k))
    s2 = math.sqrt(2)
    for i in range(k):
        for j in range(k):
            H0[i, j] = (wm * phi_f[i](x_m / 2) * phi_f[j](x_m)).sum() / s2
            G0[i, j] = (wm * psi(i, x_m / 2) * phi_f[j](x_m)).sum() / s2
            H1[i, j] = (wm * phi_f[i]((x_m + 1) / 2) * phi_f[j](x_m)).sum() / s2
            G1[i, j] = (wm * psi(i, (x_m + 1) / 2) * phi_f[j](x_m)).sum() / s2
            PHI0[i, j] = 2 * (wm * phi_f[i](2 * x_m) * phi_f[j](2 * x_m)).sum()
            PHI1[i, j] = 2 * (
                wm * phi_f[i](2 * x_m - 1) * phi_f[j](2 * x_m - 1)
            ).sum()

    return (
        _clean(H0), _clean(H1), _clean(G0), _clean(G1),
        _clean(PHI0), _clean(PHI1),
    )


def get_filter(base: str, k: int):
    """Filter bank dispatch (reference MultiWaveletCorrelation.py:585-651)."""
    if base == "legendre":
        return legendre_filters(k)
    if base == "chebyshev":
        return chebyshev_filters(k)
    raise ValueError("Base not supported")


def _reconstruction_filters(base: str, k: int):
    H0, H1, G0, G1, PHI0, PHI1 = get_filter(base, k)
    H0r = _clean(H0 @ PHI0)
    G0r = _clean(G0 @ PHI0)
    H1r = _clean(H1 @ PHI1)
    G1r = _clean(G1 @ PHI1)
    ec_s = np.concatenate((H0.T, H1.T), axis=0)
    ec_d = np.concatenate((G0.T, G1.T), axis=0)
    rc_e = np.concatenate((H0r, G0r), axis=0)
    rc_o = np.concatenate((H1r, G1r), axis=0)
    return ec_s, ec_d, rc_e, rc_o


def _wavelet_transform(x, ec_d, ec_s):
    """Even/odd split + analysis matmuls (reference :225-239, :398-411)."""
    xa = jnp.concatenate([x[:, ::2], x[:, 1::2]], axis=-1)
    d = xa @ ec_d
    s = xa @ ec_s
    return d, s


def _even_odd(x, rc_e, rc_o, k):
    """Synthesis + interleave (reference :241-250, :413-424)."""
    b, n, c, _ = x.shape
    x_e = x @ rc_e
    x_o = x @ rc_o
    out = jnp.stack([x_e, x_o], axis=2)  # (B, N, 2, c, k)
    return out.reshape(b, n * 2, c, k)


class SparseKernelFT1d(nnx.Module):
    """Frequency-domain linear operator on the lowest ``alpha`` modes
    (reference :307-337)."""

    def __init__(self, k: int, alpha: int, c: int = 1, *, rngs: nnx.Rngs):
        self.modes = alpha
        self.k = k
        d = c * k
        scale = 1.0 / (d * d)
        key1, key2 = jax.random.split(rngs.params())
        self.w_real = nnx.Param(
            scale * jax.random.uniform(key1, (d, d, self.modes))
        )
        self.w_imag = nnx.Param(
            scale * jax.random.uniform(key2, (d, d, self.modes))
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c, k = x.shape
        xf = x.reshape(b, n, c * k).transpose(0, 2, 1)  # (B, ck, N)
        x_fft = jnp.fft.rfft(xf, axis=-1)
        m = min(self.modes, n // 2 + 1)
        w = (self.w_real[...] + 1j * self.w_imag[...])[:, :, :m].astype(x_fft.dtype)
        low = jnp.einsum("bix,iox->box", x_fft[:, :, :m], w)
        out_ft = jnp.concatenate(
            [low, jnp.zeros((b, c * k, n // 2 + 1 - m), dtype=low.dtype)], axis=-1
        )
        out = jnp.fft.irfft(out_ft, n=n, axis=-1)
        return out.transpose(0, 2, 1).reshape(b, n, c, k)


class MWT_CZ1d(nnx.Module):
    """One multiwavelet Cui-Zhang block (reference :340-424)."""

    def __init__(
        self, k: int = 3, alpha: int = 64, L: int = 0, c: int = 1,
        base: str = "legendre", *, rngs: nnx.Rngs,
    ):
        self.k = k
        self.L = L
        ec_s, ec_d, rc_e, rc_o = _reconstruction_filters(base, k)
        self.ec_s = jnp.asarray(ec_s, dtype=jnp.float32)
        self.ec_d = jnp.asarray(ec_d, dtype=jnp.float32)
        self.rc_e = jnp.asarray(rc_e, dtype=jnp.float32)
        self.rc_o = jnp.asarray(rc_o, dtype=jnp.float32)

        self.A = SparseKernelFT1d(k, alpha, c, rngs=rngs)
        self.B = SparseKernelFT1d(k, alpha, c, rngs=rngs)
        self.C = SparseKernelFT1d(k, alpha, c, rngs=rngs)
        self.T0 = nnx.Linear(k, k, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c, k = x.shape
        ns = math.floor(math.log2(n))
        nl = 2 ** math.ceil(math.log2(n))
        x = jnp.concatenate([x, x[:, : nl - n]], axis=1)

        ud, us = [], []
        for _ in range(ns - self.L):
            d, x = _wavelet_transform(x, self.ec_d, self.ec_s)
            ud.append(self.A(d) + self.B(x))
            us.append(self.C(d))
        x = self.T0(x)
        for i in range(ns - 1 - self.L, -1, -1):
            x = x + us[i]
            x = jnp.concatenate([x, ud[i]], axis=-1)
            x = _even_odd(x, self.rc_e, self.rc_o, self.k)
        return x[:, :n]


class MultiWaveletTransform(nnx.Module):
    """Attention-compatible MWT self-"attention" (reference :14-60)."""

    def __init__(
        self, ich: int = 1, k: int = 8, alpha: int = 16, c: int = 128,
        nCZ: int = 1, L: int = 0, base: str = "legendre", *, rngs: nnx.Rngs,
    ):
        self.k = k
        self.c = c
        self.nCZ = nCZ
        self.Lk0 = nnx.Linear(ich, c * k, rngs=rngs)
        self.Lk1 = nnx.Linear(c * k, ich, rngs=rngs)
        self.mwt_cz = nnx.List(
            [MWT_CZ1d(k, alpha, L, c, base, rngs=rngs) for _ in range(nCZ)]
        )

    def __call__(self, queries, keys, values, attn_mask=None):
        b, l, h, e = queries.shape
        s = values.shape[1]
        if l > s:
            zeros = jnp.zeros_like(queries[:, : (l - s)])
            values = jnp.concatenate([values, zeros], axis=1)
        else:
            values = values[:, :l]
        v = values.reshape(b, l, -1)
        v = self.Lk0(v).reshape(b, l, self.c, -1)
        for i, blk in enumerate(self.mwt_cz):
            v = blk(v)
            if i < self.nCZ - 1:
                v = jax.nn.relu(v)
        v = self.Lk1(v.reshape(b, l, -1))
        return v.reshape(b, l, -1, e), None


class FourierCrossAttentionW(nnx.Module):
    """Parameter-free frequency-domain cross attention (reference :249-305)."""

    def __init__(
        self, in_channels, out_channels, seq_len_q, seq_len_kv, modes=16,
        activation="tanh",
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.modes = modes
        self.activation = activation

    def __call__(self, q, k, v, attn_mask=None):
        b, l, e, h = q.shape
        xq = q.transpose(0, 3, 2, 1)  # (B, H, E, L)
        xk = k.transpose(0, 3, 2, 1)
        lk = xk.shape[-1]
        mq = min(l // 2, self.modes)
        mk = min(lk // 2, self.modes)

        xq_ft = jnp.fft.rfft(xq, axis=-1)[..., :mq]
        xk_ft = jnp.fft.rfft(xk, axis=-1)[..., :mk]
        xqk = jnp.einsum("bhex,bhey->bhxy", xq_ft, xk_ft)
        if self.activation == "tanh":
            xqk = jnp.tanh(xqk.real) + 1j * jnp.tanh(xqk.imag)
        elif self.activation == "softmax":
            w = jax.nn.softmax(jnp.abs(xqk), axis=-1)
            xqk = w.astype(jnp.complex64)
        else:
            raise ValueError(f"{self.activation} activation is not implemented")
        xqkv = jnp.einsum("bhxy,bhey->bhex", xqk, xk_ft)
        out_ft = jnp.concatenate(
            [xqkv, jnp.zeros((b, h, e, l // 2 + 1 - mq), dtype=xqkv.dtype)], axis=-1
        )
        out = jnp.fft.irfft(
            out_ft / self.in_channels / self.out_channels, n=l, axis=-1
        )
        return out.transpose(0, 3, 2, 1), None


class MultiWaveletCross(nnx.Module):
    """Multiwavelet cross attention (reference :63-247)."""

    def __init__(
        self, in_channels, out_channels, seq_len_q, seq_len_kv, modes,
        c=64, k=8, ich=512, L=0, base="legendre", activation="tanh",
        *, rngs: nnx.Rngs,
    ):
        self.c = c
        self.k = k
        self.L = L
        ec_s, ec_d, rc_e, rc_o = _reconstruction_filters(base, k)
        self.ec_s = jnp.asarray(ec_s, dtype=jnp.float32)
        self.ec_d = jnp.asarray(ec_d, dtype=jnp.float32)
        self.rc_e = jnp.asarray(rc_e, dtype=jnp.float32)
        self.rc_o = jnp.asarray(rc_o, dtype=jnp.float32)

        def make_attn():
            return FourierCrossAttentionW(
                in_channels, out_channels, seq_len_q, seq_len_kv, modes,
                activation=activation,
            )

        self.attn1 = make_attn()
        self.attn2 = make_attn()
        self.attn3 = make_attn()
        self.attn4 = make_attn()
        self.T0 = nnx.Linear(k, k, rngs=rngs)
        self.Lk = nnx.Linear(ich, c * k, rngs=rngs)
        self.Lq = nnx.Linear(ich, c * k, rngs=rngs)
        self.Lv = nnx.Linear(ich, c * k, rngs=rngs)
        self.out = nnx.Linear(c * k, ich, rngs=rngs)

    def __call__(self, q, k, v, attn_mask=None):
        b, n, h, e = q.shape
        s = k.shape[1]

        q = self.Lq(q.reshape(b, n, -1)).reshape(b, n, self.c, self.k)
        k = self.Lk(k.reshape(b, s, -1)).reshape(b, s, self.c, self.k)
        v = self.Lv(v.reshape(b, s, -1)).reshape(b, s, self.c, self.k)

        if n > s:
            zeros = jnp.zeros_like(q[:, : (n - s)])
            v = jnp.concatenate([v, zeros], axis=1)
            k = jnp.concatenate([k, zeros], axis=1)
        else:
            v = v[:, :n]
            k = k[:, :n]

        ns = math.floor(math.log2(n))
        nl = 2 ** math.ceil(math.log2(n))
        q = jnp.concatenate([q, q[:, : nl - n]], axis=1)
        k = jnp.concatenate([k, k[:, : nl - n]], axis=1)
        v = jnp.concatenate([v, v[:, : nl - n]], axis=1)

        ud_q, ud_k, ud_v = [], [], []
        us_q, us_k, us_v = [], [], []
        for _ in range(ns - self.L):
            d, q = _wavelet_transform(q, self.ec_d, self.ec_s)
            ud_q.append((d, q))
            us_q.append(d)
        for _ in range(ns - self.L):
            d, k = _wavelet_transform(k, self.ec_d, self.ec_s)
            ud_k.append((d, k))
            us_k.append(d)
        for _ in range(ns - self.L):
            d, v = _wavelet_transform(v, self.ec_d, self.ec_s)
            ud_v.append((d, v))
            us_v.append(d)

        ud, us = [], []
        for i in range(ns - self.L):
            dq, sq = ud_q[i], us_q[i]
            dk, sk = ud_k[i], us_k[i]
            dv, sv = ud_v[i], us_v[i]
            ud.append(
                self.attn1(dq[0], dk[0], dv[0])[0]
                + self.attn2(dq[1], dk[1], dv[1])[0]
            )
            us.append(self.attn3(sq, sk, sv)[0])
        v = self.attn4(q, k, v)[0]

        for i in range(ns - 1 - self.L, -1, -1):
            v = v + us[i]
            v = jnp.concatenate([v, ud[i]], axis=-1)
            v = _even_odd(v, self.rc_e, self.rc_o, self.k)
        v = self.out(v[:, :n].reshape(b, n, -1))
        return v.reshape(b, n, -1, e), None
