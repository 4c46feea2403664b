"""TPU-native Fokker-Planck (Smoluchowski) solver via a detailed-balance master equation.

Replaces the reference's external ``fplanck`` dependency (the only ground-truth solver
for the three FPE suites; usage surface in SURVEY.md §2.1). Physics follows the same
scheme fplanck implements (Holubec, Kroy & Steffenoni, PRE 99, 032117 (2019)): the
continuum operator ``dp/dt = div(D (grad p + beta p grad U))`` is discretized as a
lattice master equation with hopping rates

    w(n -> n+e_i) = D_bond / h_i^2 * exp(-beta * dU_bond / 2)
    w(n+e_i -> n) = D_bond / h_i^2 * exp(+beta * dU_bond / 2)

where ``dU_bond = U[n+e_i] - U[n] - W_bond`` and ``W_bond`` is the trapezoid work done
by any non-conservative force along the bond. These rates satisfy detailed balance with
the Boltzmann weight ``exp(-beta U)``, conserve mass exactly, and reflecting boundaries
are simply absent bonds.

TPU-first design (vs fplanck's scipy sparse ``expm_multiply`` loop, the hot spot of the
reference's data generation, ``1d_FPE/dataset_1d_drift_diffusion.py:67``):

- Grids are small (N <= 6400 cells), so the generator is a *dense* (N, N) matrix and
  everything runs as MXU matmuls.
- Conservative problems (all of 1D FPE / 2D FPE, incl. space-varying drag) are
  *symmetrizable*: ``B = diag(pi^-1/2) M diag(pi^1/2)`` is symmetric, so ONE ``eigh``
  gives the exact propagator at every output time simultaneously — no time stepping at
  all. 400 sequential sparse expm steps become one eigendecomposition + one batched
  matmul over all time points.
- Non-conservative problems use one dense ``expm`` of the per-step propagator and a
  ``lax.scan`` of matvecs.
- Everything is a pure function of the coefficient arrays, hence ``vmap``-able over a
  batch of random potentials for on-device dataset generation.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

KB = 1.380649e-23  # Boltzmann constant, J/K (scipy.constants.k)


def grid_from_extent(extent, resolution):
    """fplanck-compatible grid: ``N = ceil(extent / resolution)`` cells per axis
    (observed sizes: 800nm/10nm -> 80, 600nm/10nm -> 61), centered on the origin.

    Returns a list of per-axis coordinate vectors.
    """
    extent = np.atleast_1d(extent).astype(np.float64)
    axes = []
    for ext in extent:
        n = int(np.ceil(ext / resolution))
        axes.append((np.arange(n) - (n - 1) / 2.0) * resolution)
    return [jnp.asarray(a) for a in axes]


def build_generator(potential, diffusion, resolution, beta, force=None):
    """Dense master-equation generator M with dp/dt = M p (reflecting boundaries).

    potential: (n1[, n2]) energy per cell [J].
    diffusion: scalar or per-cell array [m^2/s].
    force:     optional (ndim, n1[, n2]) force field [N] (adds -W to the bond dU).
    Returns (N, N) with N = prod(grid shape), row-major flattening.
    """
    shape = potential.shape
    ndim = potential.ndim
    n_total = int(np.prod(shape))
    dtype = potential.dtype
    diff = jnp.broadcast_to(jnp.asarray(diffusion, dtype), shape)

    flat_index = np.arange(n_total).reshape(shape)
    m = jnp.zeros((n_total, n_total), dtype)

    for axis in range(ndim):
        h = resolution
        # bond quantities between n and n+e_axis
        sl_lo = [slice(None)] * ndim
        sl_hi = [slice(None)] * ndim
        sl_lo[axis] = slice(0, shape[axis] - 1)
        sl_hi[axis] = slice(1, shape[axis])
        sl_lo, sl_hi = tuple(sl_lo), tuple(sl_hi)

        du = potential[sl_hi] - potential[sl_lo]
        if force is not None:
            work = 0.5 * (force[axis][sl_hi] + force[axis][sl_lo]) * h
            du = du - work
        d_bond = 0.5 * (diff[sl_hi] + diff[sl_lo])
        rate = d_bond / (h * h)
        up = rate * jnp.exp(-beta * du / 2.0)  # n -> n+1
        dn = rate * jnp.exp(beta * du / 2.0)  # n+1 -> n

        src = jnp.asarray(flat_index[sl_lo].ravel())
        dst = jnp.asarray(flat_index[sl_hi].ravel())
        upf = up.ravel()
        dnf = dn.ravel()
        m = m.at[dst, src].add(upf)
        m = m.at[src, src].add(-upf)
        m = m.at[src, dst].add(dnf)
        m = m.at[dst, dst].add(-dnf)
    return m


def propagate_eigh(potential, diffusion, resolution, beta, p0, times):
    """Exact propagation at all ``times`` via symmetric eigendecomposition.

    Valid for conservative problems (no force), including space-varying diffusion.
    p0: (N,) initial mass distribution (sums to 1); times: (Nt,).
    Returns (Nt, N).
    """
    m = build_generator(potential, diffusion, resolution, beta)
    u_half = (beta * potential.ravel() / 2.0).astype(m.dtype)
    u_half = u_half - u_half.min()  # gauge: avoid overflow in exp
    s_inv = jnp.exp(u_half)  # pi^{-1/2} up to constant
    s = jnp.exp(-u_half)  # pi^{+1/2}
    b = (s_inv[:, None] * m) * s[None, :]
    b = 0.5 * (b + b.T)  # enforce exact symmetry before eigh
    lam, v = jnp.linalg.eigh(b)
    # a master-equation generator is negative semidefinite; clamping kills the
    # float32 eigenvalue noise that would otherwise grow as exp(+eps * t)
    lam = jnp.minimum(lam, 0.0)
    # p(t) = diag(s) V exp(lam t) V^T diag(s_inv) p0
    q0 = v.T @ (s_inv * p0)
    evol = jnp.exp(times[:, None] * lam[None, :]) * q0[None, :]  # (Nt, N)
    pt = (evol @ v.T) * s[None, :]
    return pt


def expm_markov(m, dt, tail_sigmas: float = 10.0, max_terms: int = 1024,
                squarings: int = 4):
    """Matmul-only ``expm(m * dt)`` for a Markov generator, via uniformization.

    ``e^{M dt} = e^{-a} sum_k a^k/k! P^k`` with ``P = I + M/lam`` (column-stochastic
    for ``lam >= max |M_ii|``) and ``a = lam dt``. Every term is a plain matmul — no
    LU/triangular solves, so it maps directly onto the MXU. (jax.scipy's Pade expm
    uses an LU custom call whose scoped-VMEM stack blows the 16 MB v5e limit for
    N >= ~6400; observed on the NC suite's 80x80 generator.) The truncated series is
    renormalized by the accumulated Poisson mass, which preserves column sums (mass
    conservation) exactly. Requires the scaled ``a = lam*dt/2^squarings`` well below
    ~80 in f32 (``e^{-a}`` underflow); our datasets have ``lam*dt`` ~ 5-20.

    Truncation uses a deterministic Poisson-tail bound: ``n_terms = a +
    tail_sigmas*sqrt(a) + tail_sigmas`` (tail mass < 1e-12 at 10 sigmas). A
    ``wsum < 1 - eps`` convergence test is NOT usable here: in f32 the accumulated
    Poisson mass stalls one ULP below 1.0, so any eps < ~1e-6 forces the loop to
    ``max_terms`` — observed as a 25x slowdown (1024 instead of ~40 terms) on the
    NC suite's generators.

    The series matmul runs at ``Precision.HIGHEST``: the TPU default lowers f32
    matrix-matrix products to bf16 MXU passes, whose ~0.4% entry noise leaves the
    propagator's column sums ~1% off — and a 500-step rollout amplifies that
    exponentially (observed: per-snapshot mass from 0.006x to 136x on the NC
    datasets). The returned propagator's columns are also renormalized to sum to
    exactly 1, so downstream matvec rollouts conserve mass by construction.

    ``squarings=k``: scaling-and-squaring — run the series at ``a/2^k`` (shorter by
    roughly ``a·(1 - 2^-k)`` terms) then square the propagator k times, renormalizing
    columns after each squaring. k is STATIC (jit/vmap-friendly; ``a`` is traced), so
    the k extra matmuls are always paid — the win is ~2-2.5x fewer total matmuls at
    the NC suite's a ~ 5-20, and it grows with a. k=0 recovers the plain series.
    """
    n = m.shape[0]
    lam = jnp.max(-jnp.diagonal(m)) * (1.0 + 1e-6) + jnp.asarray(1e-300, m.dtype)
    a = lam * dt / (2.0 ** squarings)
    p = jnp.eye(n, dtype=m.dtype) + m / lam
    max_f = jnp.asarray(float(max_terms), m.dtype)
    need = a + tail_sigmas * jnp.sqrt(a) + tail_sigmas
    n_terms = jnp.minimum(need, max_f)

    def cond(c):
        k, pk, acc, w = c
        return k < n_terms

    def body(c):
        k, pk, acc, w = c
        acc = acc + w * pk
        pk = jnp.dot(p, pk, preferred_element_type=m.dtype,
                     precision=jax.lax.Precision.HIGHEST)
        w = w * a / (k + 1.0)
        return (k + 1.0, pk, acc, w)

    zero = jnp.zeros((), m.dtype)
    init = (zero, jnp.eye(n, dtype=m.dtype), jnp.zeros_like(m), jnp.exp(-a))
    _, _, acc, _ = jax.lax.while_loop(cond, body, init)
    # Loud in-graph guard: if the tail bound exceeds max_terms the truncated series
    # would be badly wrong, and the column renormalization below would mask it with a
    # mass-conserving-but-incorrect propagator. Poison with NaN instead — datagen's
    # mass assertions and the train loop's divergence guard both trip on it.
    acc = jnp.where(need <= max_f, acc, jnp.full_like(acc, jnp.nan))
    acc = acc / jnp.sum(acc, axis=0, keepdims=True)
    for _ in range(squarings):
        acc = jnp.dot(acc, acc, preferred_element_type=m.dtype,
                      precision=jax.lax.Precision.HIGHEST)
        acc = acc / jnp.sum(acc, axis=0, keepdims=True)
    return acc


# jax.scipy expm's LU block breaks the v5e scoped-VMEM limit above roughly this size
_EXPM_MARKOV_MIN_N = 4096


def propagate_expm(potential, diffusion, resolution, beta, p0, times, force=None):
    """Propagation via one dense ``expm`` of the per-step propagator + matvec scan.

    ``times`` must be uniformly spaced starting at 0 (the fplanck
    ``propagate_interval`` output grid). Works for non-conservative force fields.
    Large generators (N >= 4096, i.e. the 80x80 NC grid) use the matmul-only
    :func:`expm_markov`; smaller ones keep jax.scipy's Pade ``expm``.
    """
    m = build_generator(potential, diffusion, resolution, beta, force=force)
    dt = times[1] - times[0]
    if m.shape[0] >= _EXPM_MARKOV_MIN_N:
        prop = expm_markov(m, dt)
    else:
        prop = jax.scipy.linalg.expm(m * dt)

    def step(p, _):
        p_next = jnp.dot(prop, p, precision=jax.lax.Precision.HIGHEST)
        return p_next, p_next

    _, rest = jax.lax.scan(step, p0, None, length=times.shape[0] - 1)
    return jnp.concatenate([p0[None], rest], axis=0)


@dataclass
class FokkerPlanck:
    """fplanck-compatible facade (``fokker_planck(...)`` usage in the reference).

    Parameters mirror fplanck: ``drag`` is a scalar or a callable gamma(*grid);
    ``potential`` a callable U(*grid); ``force`` a callable returning (ndim, ...).
    ``boundary`` only supports 'reflecting' (the only mode the reference uses).
    """

    temperature: float
    drag: float | Callable
    extent: float | Sequence[float]
    resolution: float
    boundary: str = "reflecting"
    potential: Callable | None = None
    force: Callable | None = None
    dtype: type | None = None

    def __post_init__(self):
        if self.dtype is None:
            self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        if self.boundary != "reflecting":
            raise NotImplementedError("only reflecting boundaries are supported (as used by the reference)")
        axes = grid_from_extent(self.extent, self.resolution)
        self.axes = [a.astype(self.dtype) for a in axes]
        mesh = jnp.meshgrid(*self.axes, indexing="ij")
        self.grid = jnp.stack(mesh) if len(axes) > 1 else mesh[0].reshape(1, -1)
        self.ndim = len(axes)
        coords = mesh
        self.beta = 1.0 / (KB * self.temperature)
        u = self.potential(*coords) if self.potential is not None else jnp.zeros(coords[0].shape, self.dtype)
        self.potential_values = jnp.asarray(u, self.dtype)
        gamma = self.drag(*coords) if callable(self.drag) else self.drag
        self.diffusion = (KB * self.temperature / jnp.asarray(gamma, self.dtype)) * jnp.ones_like(self.potential_values)
        self.force_values = jnp.asarray(self.force(*coords), self.dtype) if self.force is not None else None

    def propagate_interval(self, pdf, tf, Nsteps, normalize=True):
        """fplanck semantics: evolve over [0, tf] and return ``Nsteps`` output states at
        ``linspace(0, tf, Nsteps)`` (``sim.propagate_interval(pdf, 2e-3, Nsteps=400)``,
        ``1d_FPE/dataset_1d_drift_diffusion.py:67``). Returns (time (Nsteps,), Pt (Nsteps, *grid))."""
        coords = jnp.meshgrid(*self.axes, indexing="ij")
        p0 = jnp.asarray(pdf(*coords), self.dtype).ravel()
        if normalize:
            p0 = p0 / p0.sum()
        times = jnp.linspace(0.0, tf, Nsteps).astype(self.dtype)
        if self.force_values is None:
            pt = propagate_eigh(self.potential_values, self.diffusion, self.resolution, self.beta, p0, times)
        else:
            pt = propagate_expm(
                self.potential_values, self.diffusion, self.resolution, self.beta, p0, times,
                force=self.force_values,
            )
        return times, pt.reshape((Nsteps,) + self.potential_values.shape)


# alias matching the reference's import name
fokker_planck = FokkerPlanck


class boundary:  # noqa: N801 - fplanck API parity
    reflecting = "reflecting"
    periodic = "periodic"
