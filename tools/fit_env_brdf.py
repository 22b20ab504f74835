"""Regenerate incarnation_tpu/kernels/ibl_fit_coeffs.py.

Numpy re-implementation of the reference split-sum BRDF integration
(ref: brdf-integration.hlsl; matches kernels/ibl.env_brdf_lut: GGX sample
h = [st*sin, st*cos, ct], Smith-IBL k = rough^4/2) plus a 16x16 Chebyshev
tensor least-squares fit of NoV*A / NoV*B. Run:
  python tools/fit_env_brdf.py
"""

import numpy as np


def hammersley(n):
    i = np.arange(n)
    b = i.astype(np.uint32)
    b = ((b << np.uint32(16)) | (b >> np.uint32(16))) & np.uint32(0xFFFFFFFF)
    b = ((b & np.uint32(0x55555555)) << np.uint32(1)) | ((b & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    b = ((b & np.uint32(0x33333333)) << np.uint32(2)) | ((b & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    b = ((b & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | ((b & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    b = ((b & np.uint32(0x00FF00FF)) << np.uint32(8)) | ((b & np.uint32(0xFF00FF00)) >> np.uint32(8))
    return np.stack([i / n, b.astype(np.float64) * 2.3283064365386963e-10], -1)


def lut_gen(S, ns):
    x = np.arange(S) / S
    r = 1.0 - np.arange(S) / S
    NoV = np.broadcast_to(x[None, :], (S, S))
    R = np.broadcast_to(r[:, None], (S, S))
    v = np.stack([np.sqrt(np.maximum(1 - NoV ** 2, 0)),
                  np.zeros_like(NoV), NoV], -1)
    xi = hammersley(ns)
    A = np.zeros((S, S))
    B = np.zeros((S, S))
    a = R * R
    a2m1 = a * a - 1.0
    k = 0.5 * a * a            # Smith-IBL k = alpha^2/2 (shading.g_smith_ibl)
    g_schlick = lambda u: u / (u * (1 - k) + k)
    for i in range(ns):
        e1, e2 = xi[i]
        phi = 2 * np.pi * e1
        ct = np.sqrt((1 - e2) / (1 + a2m1 * e2))
        st = np.sqrt(np.maximum(1 - ct * ct, 0))
        h = np.stack([st * np.sin(phi), st * np.cos(phi), ct], -1)
        vh = np.sum(v * h, -1, keepdims=True)
        l = 2 * vh * h - v
        l /= np.maximum(np.linalg.norm(l, axis=-1, keepdims=True), 1e-12)
        no_l = np.clip(l[..., 2], 0, 1)
        no_h = np.clip(h[..., 2], 0, 1)
        vo_h = np.clip(vh[..., 0], 0, 1)
        g_vis = g_schlick(NoV) * g_schlick(no_l) * vo_h \
            / np.maximum(no_h * NoV, 1e-6)
        fc = (1 - vo_h) ** 5
        ok = (no_l > 0) & (NoV > 0)
        A += np.where(ok, (1 - fc) * g_vis, 0)
        B += np.where(ok, fc * g_vis, 0)
    return A / ns, B / ns


def cheb_basis(t, n):
    t = 2 * t - 1
    out = [np.ones_like(t), t]
    for k2 in range(2, n):
        out.append(2 * t * out[-1] - out[-2])
    return np.stack(out[:n], -1)


def fit(F, u, v, n, mask):
    Bu = cheb_basis(u.ravel(), n)
    Bv = cheb_basis(v.ravel(), n)
    M = (Bu[:, :, None] * Bv[:, None, :]).reshape(-1, n * n)
    w = mask.ravel().astype(float)
    coef, *_ = np.linalg.lstsq(M * w[:, None], F.ravel() * w, rcond=None)
    return coef.reshape(n, n).astype(np.float32), (M @ coef).reshape(F.shape)


def main(path="incarnation_tpu/kernels/ibl_fit_coeffs.py"):
    S = 128
    A, B = lut_gen(S, 1024)
    x = np.arange(S) / S
    r = 1.0 - np.arange(S) / S
    X = np.broadcast_to(x[None, :], (S, S))
    R = np.broadcast_to(r[:, None], (S, S))
    mask = X > 0
    CA, pA = fit(A * X, X ** 0.25, R, 16, mask)
    CB, pB = fit(B * X, X ** 0.25, np.sqrt(R), 16, mask)
    recA = pA / np.maximum(X, 1 / 256)
    recB = pB / np.maximum(X, 1 / 256)
    relA = (np.abs(recA - A) / np.maximum(A, 5e-2))[mask]
    relB = (np.abs(recB - B) / np.maximum(B, 5e-2))[mask]
    print(f"fit rel err max: A {relA.max():.4f}  B {relB.max():.4f}")

    def fmt(name, C):
        rows = ["    [" + ", ".join(f"{v:.8e}" for v in r_) + "],"
                for r_ in C]
        return f"{name} = [\n" + "\n".join(rows) + "\n]\n"

    hdr = ('"""Fitted split-sum env-BRDF coefficients (generated — do not '
           'edit).\n\n16x16 Chebyshev tensor fits of NoV*A and NoV*B in '
           'u = 2*NoV^(1/4) - 1 with\nv = 2*rough - 1 (A) / 2*sqrt(rough) - '
           '1 (B); evaluate then divide by\nmax(NoV, 1/256). Regenerate: '
           'python tools/fit_env_brdf.py\n"""\n\n')
    open(path, "w").write(hdr + fmt("CHEB_A", CA) + "\n" + fmt("CHEB_B", CB))
    print("wrote", path)


if __name__ == "__main__":
    main()
