"""Time-periodic DDE monodromy NEPs (reference
``src/gallery_extra/periodic_dde.jl``; Bueler SINUM 2007): compute_MM by ODE
time-stepping — RK4 for ODE form, backward-Euler for the DAE form — so the
NEP's matrix action is a monodromy map."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ...core.nep import NEP, mlincomb_from_mm
from ...ops import matfun

__all__ = ["PeriodicDDE_NEP", "PeriodicDDE_NEP_ODE", "PeriodicDDE_NEP_DAE", "periodic_dde_gallery"]


def _ode_rk4(f, a, b, N, y0):
    h = (b - a) / N
    t = a
    y = np.array(y0, dtype=complex)
    for _ in range(N):
        s1 = h * f(t, y)
        s2 = h * f(t + h / 2, y + s1 / 2)
        s3 = h * f(t + h / 2, y + s2 / 2)
        s4 = h * f(t + h, y + s3)
        y = y + (s1 + 2 * s2 + 2 * s3 + s4) / 6
        t = t + h
    return y


def _ode_be_dae(Af, E, a, b, N, y0):
    h = (b - a) / N
    y = np.array(y0, dtype=complex)
    t = a + h
    for _ in range(N):
        y = np.linalg.solve(h * Af(t) - E, E @ y)
        t = t + h
    return y


class PeriodicDDE_NEP(NEP):
    """x'(t) = A(t) x(t) + B(t) x(t - tau) with tau-periodic A, B."""

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        return mlincomb_from_mm(self, lam, V, a, startder)

    def Mder(self, lam, der: int = 0):
        n = self.n
        if der == 0:
            Z = np.zeros((n, n), dtype=complex)
            for k in range(n):
                ek = np.zeros(n)
                ek[k] = 1.0
                Z[:, k] = np.asarray(self.Mlincomb(lam, ek[:, None], jnp.ones(1)))
            return jnp.asarray(Z)
        if der == 1:
            ee = np.sqrt(np.finfo(float).eps) / 10
            Yp = np.asarray(self.Mder(lam + ee, 0))
            Ym = np.asarray(self.Mder(lam - ee, 0))
            return jnp.asarray((Yp - Ym) / (2 * ee))
        raise NotImplementedError("Higher derivatives not implemented")

    Mder_dense = Mder


class PeriodicDDE_NEP_ODE(PeriodicDDE_NEP):
    def __init__(self, A, B, tau, N=1000):
        self.A = A
        self.B = B
        self.tau = tau
        self.N = N
        self.n = np.asarray(A(0.0)).shape[0]

    def MM(self, S, V):
        S = np.asarray(S)
        V = np.asarray(V, dtype=complex)
        tau = self.tau
        if S.shape[0] == 1:
            s = complex(S[0, 0])
            F = lambda t, Y: (np.asarray(self.A(t)) @ Y
                              + np.asarray(self.B(t)) @ Y * np.exp(-tau * s) - Y * s)
        else:
            eS = np.asarray(matfun.expm(jnp.asarray(-tau * S)))
            F = lambda t, Y: (np.asarray(self.A(t)) @ Y
                              + np.asarray(self.B(t)) @ Y @ eS - Y @ S)
        YY = _ode_rk4(F, 0.0, float(np.real(tau)), self.N, V)
        return jnp.asarray(YY - V)


class PeriodicDDE_NEP_DAE(PeriodicDDE_NEP):
    def __init__(self, A, B, E, tau, N=1000):
        self.A = A
        self.B = B
        self.E = np.asarray(E, dtype=complex)
        self.tau = tau
        self.N = N
        self.n = np.asarray(A(0.0)).shape[0]

    def MM(self, S, V):
        S = np.asarray(S)
        V = np.asarray(V, dtype=complex)
        if V.shape[1] > 1:
            raise NotImplementedError("DAE compute_MM implemented for single vectors")
        s = complex(S[0, 0])
        Af = lambda t: (np.asarray(self.A(t)) + np.asarray(self.B(t)) * np.exp(-self.tau * s)
                        - s * self.E)
        YY = _ode_be_dae(Af, self.E, 0.0, float(np.real(self.tau)), self.N, V)
        return jnp.asarray(YY - V)


MATHIEU_EIGENVALUES = np.array(
    [
        -0.24470143590830754,
        -0.561610418452567 - 1.511169478595549j,
        -0.561610418452567 + 1.511169478595549j,
        -1.859617846506182 - 1.261010754174415j,
        -1.859617846506182 + 1.261010754174415j,
    ]
)


def periodic_dde_gallery(name="mathieu", n=200, N=1000):
    """(reference ``periodic_dde_gallery``)."""
    if name == "mathieu":
        delta, b, a, tau = 1.0, 0.5, 0.1, 2.0
        A = lambda t: np.array([[0.0, 1.0], [-(delta + a * np.cos(np.pi * t)), -1.0]])
        B = lambda t: np.array([[0.0, 0.0], [b, 0.0]])
        return PeriodicDDE_NEP_ODE(A, B, tau, N=N)
    if name == "rand0":
        from .msws import MSWS_RNG

        rng = MSWS_RNG()
        import scipy.sparse as sp

        I = np.eye(n)
        A0 = rng.gen_spmat(n, n, 0.3).toarray() - I
        A1 = rng.gen_spmat(n, n, 0.3).toarray() - I
        B0 = rng.gen_spmat(n, n, 0.3).toarray() - I
        B1 = rng.gen_spmat(n, n, 0.3).toarray() - I
        A = lambda t: A0 + np.cos(np.pi * t) * A1
        B = lambda t: B0 + np.exp(0.01 * np.sin(np.pi * t)) * B1
        return PeriodicDDE_NEP_ODE(A, B, 2.0, N=N)
    if name == "discont":
        delta, b, a, tau = 1.0, 0.5, 0.1, 2.0
        A = lambda t: (np.array([[0.0, 1.0], [-(delta + a * np.cos(np.pi * t)), -1.0]])
                       + np.eye(2) * ((t - 0.3) ** 2) * (t > 0.3))
        B = lambda t: np.array([[0.0, 0.0], [b, 0.0]])
        return PeriodicDDE_NEP_ODE(A, B, tau, N=N)
    if name == "milling1_be":
        A0 = np.array([[0.0, 1.0], [-1.0, -2.0]])
        phi = lambda t: 2 * np.pi * t
        h = lambda t: (t < 0.5) * (np.sin(phi(t)) ** 2 + np.cos(phi(t)) * np.sin(phi(t)))
        E21 = np.zeros((2, 2))
        E21[1, 0] = 1.0
        nep = PeriodicDDE_NEP_DAE(lambda t: A0 - E21 * h(t), lambda t: E21 * h(t),
                                  np.eye(2), 1.0, N=50)
        return nep
    if name == "milling1_rk4":
        A0 = np.array([[0.0, 1.0], [-1.0, -2.0]])
        phi = lambda t: 2 * np.pi * t
        h = lambda t: (t < 0.5) * (np.sin(phi(t)) ** 2 + np.cos(phi(t)) * np.sin(phi(t)))
        E21 = np.zeros((2, 2))
        E21[1, 0] = 1.0
        return PeriodicDDE_NEP_ODE(lambda t: A0 - E21 * h(t), lambda t: E21 * h(t), 1.0, N=50)
    raise ValueError(f"Unknown PeriodicDDE_NEP type: {name}")
