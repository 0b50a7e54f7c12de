"""Celerite kernel terms (SHO / Rotation / Brownian / sums).

TPU-native replacement for the celerite2 C++ term classes the reference
builds on (reference: gp.py:4,487-497,524,363-374). Every term lowers to
the celerite coefficient representation

    k(tau) = sum_r a_r exp(-c_r tau)
           + sum_c exp(-c_c tau) (a_c cos(d_c tau) + b_c sin(d_c tau))

with a *static* number of (real, complex) slots per term class, so kernels
rebuild under jit with traced hyperparameters (the reference re-instantiates
C++ objects per likelihood evaluation, gp.py:369-374; here it is pure traced
arithmetic). Overdamped/underdamped SHO branches are branch-free selects.

Conventions follow celerite2 (Foreman-Mackey et al. 2017; celerite2 docs):
SHOTerm accepts (S0|sigma) x (w0|rho) x (Q|tau); RotationTerm is the
two-SHO starspot kernel; PSDs are in the sqrt(2/pi) normalization.
"""

import jax
import numpy as np
import jax.numpy as jnp

__all__ = ["Term", "TermSum", "SHOTerm", "RotationTerm", "BrownianTerm"]

_EPS = 1e-10


class Term:
    """Base: subclasses provide coefficients() -> (ar, cr, ac, bc, cc, dc)."""

    def coefficients(self):
        raise NotImplementedError

    def __add__(self, other):
        return TermSum(self, other)

    def get_value(self, tau):
        """k(tau) (stationary; tau may be any-sign array)."""
        tau = jnp.abs(jnp.asarray(tau))
        shape = tau.shape
        tf = tau.reshape(1, -1)
        ar, cr, ac, bc, cc, dc = self.coefficients()
        k = jnp.zeros(tf.shape[1], tf.dtype)
        if ar.shape[0]:
            k = k + jnp.sum(ar[:, None] * jnp.exp(-cr[:, None] * tf), axis=0)
        if ac.shape[0]:
            e = jnp.exp(-cc[:, None] * tf)
            k = k + jnp.sum(
                e * (ac[:, None] * jnp.cos(dc[:, None] * tf)
                     + bc[:, None] * jnp.sin(dc[:, None] * tf)),
                axis=0,
            )
        return k.reshape(shape)

    def get_psd(self, omega):
        """Power spectral density at angular frequency omega
        (celerite2 normalization: sqrt(2/pi) x rational terms)."""
        omega = jnp.asarray(omega)
        w2 = omega**2
        ar, cr, ac, bc, cc, dc = self.coefficients()
        psd = jnp.zeros_like(w2)
        for j in range(ar.shape[0]):
            psd = psd + ar[j] * cr[j] / (cr[j] ** 2 + w2)
        for j in range(ac.shape[0]):
            a, b, c, d = ac[j], bc[j], cc[j], dc[j]
            c2 = c**2
            d2 = d**2
            num = (a * c + b * d) * (c2 + d2) + (a * c - b * d) * w2
            den = w2**2 + 2 * (c2 - d2) * w2 + (c2 + d2) ** 2
            psd = psd + num / den
        return jnp.sqrt(2 / jnp.pi) * psd

    def k0(self):
        """k(0) = sum(ar) + sum(ac)."""
        ar, _, ac, _, _, _ = self.coefficients()
        s = jnp.asarray(0.0)
        if ar.shape[0]:
            s = s + jnp.sum(ar)
        if ac.shape[0]:
            s = s + jnp.sum(ac)
        return s


class TermSum(Term):
    def __init__(self, *terms):
        flat = []
        for t in terms:
            if isinstance(t, TermSum):
                flat.extend(t.terms)
            else:
                flat.append(t)
        self.terms = tuple(flat)

    def coefficients(self):
        parts = [t.coefficients() for t in self.terms]
        return tuple(
            jnp.concatenate([jnp.atleast_1d(p[i]) for p in parts])
            if any(np.size(p[i]) for p in parts)
            else jnp.zeros(0)
            for i in range(6)
        )


class SHOTerm(Term):
    """Stochastically-driven damped harmonic oscillator.

    Exactly one of (S0, sigma), one of (w0, rho), one of (Q, tau):
      rho = 2 pi / w0;  tau = 2 Q / w0;  sigma = sqrt(S0 w0 Q).
    Q >= 0.5 lowers to one complex celerite term; Q < 0.5 to two real
    terms. With a concrete Q the branch is decided at trace time and only
    the live slots are emitted (halving the solver state dimension); with
    a traced Q both are represented simultaneously via select-masked
    slots.
    """

    def __init__(self, *, S0=None, sigma=None, w0=None, rho=None, Q=None, tau=None):
        if (w0 is None) == (rho is None):
            raise ValueError("provide exactly one of w0, rho")
        if w0 is None:
            w0 = 2 * jnp.pi / rho
        if (Q is None) == (tau is None):
            raise ValueError("provide exactly one of Q, tau")
        if Q is None:
            Q = 0.5 * w0 * tau
        if (S0 is None) == (sigma is None):
            raise ValueError("provide exactly one of S0, sigma")
        if S0 is None:
            S0 = sigma**2 / (w0 * Q)
        self.S0 = jnp.asarray(S0)
        self.w0 = jnp.asarray(w0)
        self.Q = jnp.asarray(Q)

    def coefficients(self):
        S0, w0, Q = self.S0, self.w0, self.Q
        # STATIC fast path: when Q is concrete (not traced through jit/
        # vmap over hyperparameters), the under/overdamped branch is known
        # at trace time — emit ONLY the live slots. This halves the state
        # dimension of every downstream solver (element traffic in the
        # Kalman solvers scales as r^2, flops as r^3), instead of carrying
        # select-masked dead slots.
        if not isinstance(Q, jax.core.Tracer):
            qv = float(Q)
            empty = jnp.zeros(0, jnp.result_type(S0))
            if qv >= 0.5:
                fc = jnp.sqrt(jnp.maximum(4 * Q**2 - 1.0, _EPS))
                a_c = S0 * w0 * Q
                return (
                    empty,
                    empty,
                    jnp.stack([a_c]),
                    jnp.stack([a_c / fc]),
                    jnp.stack([0.5 * w0 / Q]),
                    jnp.stack([0.5 * w0 / Q * fc]),
                )
            fr = jnp.sqrt(jnp.maximum(1.0 - 4 * Q**2, _EPS))
            return (
                jnp.stack([
                    0.5 * S0 * w0 * Q * (1 + 1 / fr),
                    0.5 * S0 * w0 * Q * (1 - 1 / fr),
                ]),
                jnp.stack([
                    0.5 * w0 / Q * (1 - fr),
                    0.5 * w0 / Q * (1 + fr),
                ]),
                empty,
                empty,
                empty,
                empty,
            )
        under = Q >= 0.5
        # underdamped (complex slot)
        fc = jnp.sqrt(jnp.maximum(4 * Q**2 - 1.0, _EPS))
        a_c = S0 * w0 * Q
        b_c = a_c / fc
        c_c = 0.5 * w0 / Q
        d_c = c_c * fc
        # overdamped (two real slots)
        fr = jnp.sqrt(jnp.maximum(1.0 - 4 * Q**2, _EPS))
        ar1 = 0.5 * S0 * w0 * Q * (1 + 1 / fr)
        ar2 = 0.5 * S0 * w0 * Q * (1 - 1 / fr)
        cr1 = 0.5 * w0 / Q * (1 - fr)
        cr2 = 0.5 * w0 / Q * (1 + fr)
        zero = jnp.zeros_like(S0)
        one = jnp.ones_like(S0)
        ar = jnp.stack([jnp.where(under, zero, ar1), jnp.where(under, zero, ar2)])
        cr = jnp.stack([jnp.where(under, one, cr1), jnp.where(under, one, cr2)])
        ac = jnp.stack([jnp.where(under, a_c, zero)])
        bc = jnp.stack([jnp.where(under, b_c, zero)])
        cc = jnp.stack([jnp.where(under, c_c, one)])
        dc = jnp.stack([jnp.where(under, d_c, zero)])
        return ar, cr, ac, bc, cc, dc

    def get_psd(self, omega):
        omega = jnp.asarray(omega)
        w2 = omega**2
        return (
            jnp.sqrt(2 / jnp.pi)
            * self.S0
            * self.w0**4
            / ((w2 - self.w0**2) ** 2 + self.w0**2 * w2 / self.Q**2)
        )


class RotationTerm(TermSum):
    """Two-SHO starspot rotation kernel (celerite2 RotationTerm;
    reference usage gp.py:524)."""

    def __init__(self, *, sigma, period, Q0, dQ, f):
        self.sigma = jnp.asarray(sigma)
        self.period = jnp.asarray(period)
        self.Q0 = jnp.asarray(Q0)
        self.dQ = jnp.asarray(dQ)
        self.f = jnp.asarray(f)
        amp = sigma**2 / (1 + f)
        Q1 = 0.5 + Q0 + dQ
        w1 = 4 * jnp.pi * Q1 / (period * jnp.sqrt(jnp.maximum(4 * Q1**2 - 1, _EPS)))
        S1 = amp / (w1 * Q1)
        Q2 = 0.5 + Q0
        w2 = 8 * jnp.pi * Q2 / (period * jnp.sqrt(jnp.maximum(4 * Q2**2 - 1, _EPS)))
        S2 = f * amp / (w2 * Q2)
        super().__init__(
            SHOTerm(S0=S1, w0=w1, Q=Q1),
            SHOTerm(S0=S2, w0=w2, Q=Q2),
        )


class BrownianTerm(TermSum):
    """Quasi-periodic SHO + overdamped background SHO
    (reference gp.py:487-497)."""

    def __init__(self, sigma, tau, period, mix):
        Q = 0.01
        sigma_1 = sigma * jnp.sqrt(mix)
        f = np.sqrt(1 - 4 * Q**2)
        w0 = 2 * Q / (tau * (1 - f))
        S0 = (1 - mix) * sigma**2 / (0.5 * w0 * Q * (1 + 1 / f))
        super().__init__(
            SHOTerm(sigma=sigma_1, tau=tau, rho=period),
            SHOTerm(S0=S0, w0=w0, Q=Q),
        )
