"""Boundary-element Helmholtz NEP on the Fichera corner (reference
``src/gallery_extra/bem_hardcoded/``; Steinlechner 2010, Effenberger &
Kressner 2012): hardcoded cube-with-corner mesh, Gauss-quadrature assembly of
the de Hoop fundamental solution; ``compute_Mder`` assembles a dense matrix
per lambda.  The reference's double loop is vectorized here over all triangle
pairs (numpy broadcasting)."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ...core.nep import NEP, mlincomb_from_mder

__all__ = ["BEM_NEP", "bem_fichera", "gen_ficheramesh", "assemble_BEM"]


def gen_ficheramesh(N=3):
    """Fichera-corner surface mesh: returns dict of stacked triangle data
    (reference ``gen_ficheramesh``)."""
    if N % 2 != 0:
        N = N + 1
    nn = N // 2
    area = 0.25 / N / N
    grid = np.arange(N + 1) / N
    fixdim = [0, 1, 2, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2]
    fixdim_val = [0, 0, 0, 1, 1, 1, 0.5, 1, 1, 1, 0.5, 1, 1, 1, 0.5]
    freedims = [(1, 2), (2, 0), (0, 1), (1, 2), (1, 2), (1, 2), (1, 2),
                (2, 0), (2, 0), (2, 0), (2, 0), (0, 1), (0, 1), (0, 1), (0, 1)]
    Nvals = [
        (1, N, 1, N), (1, N, 1, N), (1, N, 1, N),
        (1, nn, 1, nn), (nn + 1, N, 1, nn), (1, nn, nn + 1, N), (nn + 1, N, nn + 1, N),
        (1, nn, 1, nn), (nn + 1, N, 1, nn), (1, nn, nn + 1, N), (nn + 1, N, nn + 1, N),
        (1, nn, 1, nn), (nn + 1, N, 1, nn), (1, nn, nn + 1, N), (nn + 1, N, nn + 1, N),
    ]
    P1s, P2s, P3s = [], [], []

    def addtri(center, l, fd, fv, free, ii, jj, a, b, c, d):
        P2 = center.copy()
        P1 = np.zeros(3)
        P1[fd] = fv
        P3 = P1.copy()
        P1[free[0]] = grid[ii + a - 1]
        P1[free[1]] = grid[jj + b - 1]
        P3[free[0]] = grid[ii + c - 1]
        P3[free[1]] = grid[jj + d - 1]
        P1s.append(P1)
        P2s.append(P2)
        P3s.append(P3)

    for l in range(15):
        i0, i1, j0, j1 = Nvals[l]
        for ii in range(i0, i1 + 1):
            for jj in range(j0, j1 + 1):
                center = np.zeros(3)
                center[fixdim[l]] = fixdim_val[l]
                free = freedims[l]
                center[free[0]] = (grid[ii - 1] + grid[ii]) / 2
                center[free[1]] = (grid[jj - 1] + grid[jj]) / 2
                if l < 3:
                    for (a, b, c, d) in [(0, 0, 1, 0), (1, 0, 1, 1), (1, 1, 0, 1), (0, 1, 0, 0)]:
                        addtri(center, l, fixdim[l], fixdim_val[l], free, ii, jj, a, b, c, d)
                else:
                    for (a, b, c, d) in [(0, 0, 0, 1), (0, 1, 1, 1), (1, 1, 1, 0), (1, 0, 0, 0)]:
                        addtri(center, l, fixdim[l], fixdim_val[l], free, ii, jj, a, b, c, d)

    P1 = np.array(P1s)
    P2 = np.array(P2s)
    P3 = np.array(P3s)

    def normalize(v):
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    tau1 = normalize(P2 - P1)
    tau2 = normalize(P3 - P2)
    tau3 = normalize(P1 - P3)
    normal = normalize(np.cross(tau1, tau2))
    nu1 = normalize(np.cross(tau1, normal))
    nu2 = normalize(np.cross(tau2, normal))
    nu3 = normalize(np.cross(tau3, normal))
    return dict(P1=P1, P2=P2, P3=P3, area=area, tau1=tau1, tau2=tau2, tau3=tau3,
                normal=normal, nu1=nu1, nu2=nu2, nu3=nu3,
                midpoint=(P1 + P2 + P3) / 3)


def precompute_quad(mesh, gauss_order=3):
    if gauss_order != 3:
        raise ValueError("The Gauss quadrature order you specified is not implemented")
    pt = np.array([[2 / 3, 1 / 6, 1 / 6], [1 / 6, 2 / 3, 1 / 6], [1 / 6, 1 / 6, 2 / 3]])
    wg = np.array([1 / 3, 1 / 3, 1 / 3])
    VK = np.stack([mesh["P1"], mesh["P2"], mesh["P3"]], axis=1)  # (n, 3verts, 3dim)
    mesh["gaussP"] = np.einsum("qv,nvd->ndq", pt, VK)  # (n, 3dim, 3pts)
    mesh["gaussW"] = mesh["area"] * wg  # shared by all triangles
    return mesh


def _solid_angle(R1, R2, R3):
    """Vectorized solid angle (reference ``solidAngle``); R* shape (..., 3)."""
    numer = np.abs(
        R1[..., 0] * R2[..., 1] * R3[..., 2] - R1[..., 0] * R2[..., 2] * R3[..., 1]
        + R1[..., 1] * R2[..., 2] * R3[..., 0] - R1[..., 1] * R2[..., 0] * R3[..., 2]
        + R1[..., 2] * R2[..., 0] * R3[..., 1] - R1[..., 2] * R2[..., 1] * R3[..., 0]
    )
    l1 = np.linalg.norm(R1, axis=-1)
    l2 = np.linalg.norm(R2, axis=-1)
    l3 = np.linalg.norm(R3, axis=-1)
    denom = (l1 * l2 * l3 + l1 * np.sum(R2 * R3, axis=-1)
             + l2 * np.sum(R1 * R3, axis=-1) + l3 * np.sum(R1 * R2, axis=-1))
    sol = 2 * np.arctan2(numer, denom)
    sol[sol < 0] += 2 * np.pi
    return sol


def _deHoop_all(mesh):
    """Singular-kernel integrals: out[r, c] = deHoop(gaussP_r, tri_c)' * gaussW
    for all pairs (vectorized reference ``deHoop``)."""
    G = mesh["gaussP"]  # (n, 3, 3pts)
    n = G.shape[0]
    x = np.transpose(G, (0, 2, 1))  # (n, pts, dim)
    with np.errstate(all="ignore"):
        # R*: (c, r, pts, dim) = P*_c - x_r
        R1 = mesh["P1"][:, None, None, :] - x[None, :, :, :]
        R2 = mesh["P2"][:, None, None, :] - x[None, :, :, :]
        R3 = mesh["P3"][:, None, None, :] - x[None, :, :, :]
        n1 = np.linalg.norm(R1, axis=-1)
        n2 = np.linalg.norm(R2, axis=-1)
        n3 = np.linalg.norm(R3, axis=-1)
        dist = np.abs(np.einsum("cd,crpd->crp", mesh["normal"], R1))
        solang = _solid_angle(R1, R2, R3)
        d_R1_Nu1 = np.einsum("cd,crpd->crp", mesh["nu1"], R1)
        d_R2_Nu2 = np.einsum("cd,crpd->crp", mesh["nu2"], R2)
        d_R3_Nu3 = np.einsum("cd,crpd->crp", mesh["nu3"], R3)
        d_R1_T1 = np.einsum("cd,crpd->crp", mesh["tau1"], R1)
        d_R2_T2 = np.einsum("cd,crpd->crp", mesh["tau2"], R2)
        d_R3_T3 = np.einsum("cd,crpd->crp", mesh["tau3"], R3)
        d_R2_T1 = np.einsum("cd,crpd->crp", mesh["tau1"], R2)
        d_R3_T2 = np.einsum("cd,crpd->crp", mesh["tau2"], R3)
        d_R1_T3 = np.einsum("cd,crpd->crp", mesh["tau3"], R1)
        F = (-dist * solang
             + np.nan_to_num(d_R1_Nu1 * np.log((n2 + d_R2_T1) / (n1 + d_R1_T1)))
             + np.nan_to_num(d_R2_Nu2 * np.log((n3 + d_R3_T2) / (n2 + d_R2_T2)))
             + np.nan_to_num(d_R3_Nu3 * np.log((n1 + d_R1_T3) / (n3 + d_R3_T3))))
    # (c, r, pts) -> contract with gauss weights of row triangle
    W = mesh["gaussW"]
    return np.einsum("crp,p->rc", F, W)


def assemble_BEM(lam, mesh, gauss_order=3, der=0):
    """Dense BEM matrix T(lam) (or its der-th derivative); vectorized over
    all pairs (reference ``assemble_BEM``)."""
    G = mesh["gaussP"]  # (n, dim, pts)
    n = G.shape[0]
    rowind = np.repeat(np.arange(3), 3)
    colind = np.tile(np.arange(3), 3)
    A = G[:, :, rowind]  # (n, 3, 9)
    B = G[:, :, colind]
    diff = A[:, None, :, :] - B[None, :, :, :]  # (n, n, 3, 9)
    dist = np.sqrt(np.sum(diff**2, axis=2))  # (n, n, 9)
    idx = dist == 0
    dist[idx] = 1.0
    lam = complex(lam)
    if der == 0:
        E = np.exp(1j * lam * dist) - 1
        E[idx] = 1j * lam
    elif der == 1:
        E = (1j * dist) * np.exp(1j * lam * dist)
        E[idx] = 1j
    else:
        E = ((1j * dist) ** der) * np.exp(1j * lam * dist)
        E[idx] = 0.0
    W = mesh["gaussW"]
    aa = W[rowind] * W[colind]
    T = np.einsum("rck,k->rc", E / dist, aa) / (4 * np.pi)
    if der == 0:
        T = T + _deHoop_all(mesh) / (4 * np.pi)
    # the reference computes only the upper triangle and mirrors it
    T = np.triu(T) + np.triu(T, 1).T
    return T


class BEM_NEP(NEP):
    def __init__(self, mesh, gauss_order=3):
        self.mesh = precompute_quad(mesh, gauss_order)
        self.n = mesh["P1"].shape[0]
        self.gauss_order = gauss_order

    def Mder(self, lam, der: int = 0):
        return jnp.asarray(assemble_BEM(lam, self.mesh, self.gauss_order, der))

    Mder_dense = Mder

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        return mlincomb_from_mder(self, lam, V, a, startder)


def bem_fichera(N=3):
    return BEM_NEP(gen_ficheramesh(N))
