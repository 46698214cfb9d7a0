"""Device MockProver: constraint evaluation as batched tensor programs.

SURVEY.md §7 L4': the single vertical gate makes constraint checking a 4-tap
stencil — `q[i] * (A[i] + A[i+1]*A[i+2] - A[i+3]) == 0` — which runs over all
columns at once on device. Copy constraints become a gather/compare on index
tensors; range lookups a limb comparison against the bound. The host
`backend.mock.MockProver` remains the exact-oracle; this one is the fast path
for big circuits (identical verdicts, coarser error reporting).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..gates.circuit import PhysicalCircuit
from ..ops.limbs import N_LIMBS, DeviceField, ints_to_limbs
from ..utils.fields import FR_BN254


def _pack_col(df: DeviceField, vals: list[int], n: int) -> np.ndarray:
    mont = [(int(v) << 256) % df.p_int for v in vals] + [0] * (n - len(vals))
    return ints_to_limbs(mont)


class DeviceMockProver:
    """Evaluates all constraints of a PhysicalCircuit on device."""

    def __init__(self, circuit: PhysicalCircuit):
        self.circuit = circuit
        self.df = DeviceField(FR_BN254)

    def verify(self) -> list[str]:
        c = self.circuit
        df = self.df
        n = c.num_rows()
        errors: list[str] = []

        # --- 1. vertical gate stencil, every phase's columns at once -------
        # (columns of ALL phases obey the same 4-tap stencil; stacking them
        # keeps one executable per total column count)
        gate_cols: list[tuple[int, int, list, list]] = []  # (phase, col, vals, sels)
        for t, phase in enumerate(c.phases):
            for i, (vals, sels) in enumerate(zip(phase.columns, phase.selectors)):
                gate_cols.append((t, i, vals, sels))
        if gate_cols:
            ncols = len(gate_cols)
            A = np.zeros((ncols, n, N_LIMBS), dtype=np.uint32)
            Q = np.zeros((ncols, n), dtype=bool)
            for i, (_t, _c, vals, sels) in enumerate(gate_cols):
                A[i] = _pack_col(df, vals, n)
                Q[i, : len(sels)] = sels
            A = jnp.asarray(np.ascontiguousarray(A.transpose(0, 2, 1)))  # [C,16,n]
            Q = jnp.asarray(Q)

            @jax.jit
            def gate_failures(A, Q):
                a = A
                b = jnp.roll(A, -1, axis=-1)
                cc = jnp.roll(A, -2, axis=-1)
                d = jnp.roll(A, -3, axis=-1)
                lhs = df._add(a, df._mont_mul(b, cc))
                diff = df._sub(lhs, d)
                bad = Q & ~df.is_zero(diff)
                return jnp.sum(bad), bad

            n_bad, bad = gate_failures(A, Q)
            if int(n_bad) > 0:
                idx = np.argwhere(np.asarray(jax.device_get(bad)))[:8]
                for flat, row in idx:
                    t, col = gate_cols[flat][0], gate_cols[flat][1]
                    errors.append(
                        f"gate failure at phase {t} column {col} row {row}"
                    )

        # --- 2. copy constraints: gather + compare ---
        if c.copies:
            flat_vals: list[int] = []
            index_of: dict = {}

            def cell_value(cell):
                kind, ph, col, row = cell
                if kind == "advice":
                    cols = c.phases[ph].columns
                    v = cols[col][row] if col < len(cols) and row < len(cols[col]) else 0
                elif kind == "lookup":
                    cols = c.lookup_cols[ph]
                    v = cols[col][row] if col < len(cols) and row < len(cols[col]) else 0
                elif kind == "fixed":
                    v = c.fixed_cols[col][row] if row < len(c.fixed_cols[col]) else 0
                elif kind == "instance":
                    v = c.instances[col][row] if row < len(c.instances[col]) else 0
                elif kind == "dynadv":
                    flat = 0
                    v = 0
                    for s in c.dyn_sets:
                        w = 2 * s["key_col"]
                        if col < flat + w:
                            cols2 = s["key_cols"] + s["table_cols"]
                            cv = cols2[col - flat]
                            v = cv[row] if row < len(cv) else 0
                            break
                        flat += w
                else:
                    raise ValueError(kind)
                return v

            left_idx, right_idx = [], []
            for left, right in c.copies:
                for cell, acc in ((left, left_idx), (right, right_idx)):
                    key = cell
                    pos = index_of.get(key)
                    if pos is None:
                        pos = len(flat_vals)
                        index_of[key] = pos
                        flat_vals.append(cell_value(cell))
                    acc.append(pos)
            V = jnp.asarray(ints_to_limbs([v % df.p_int for v in flat_vals]))
            L = jnp.asarray(np.asarray(left_idx, dtype=np.int32))
            R = jnp.asarray(np.asarray(right_idx, dtype=np.int32))
            neq = ~jnp.all(V[L] == V[R], axis=-1)  # host rows [m, 16]: limbs minor
            n_bad = int(jnp.sum(neq))
            if n_bad:
                errors.append(f"{n_bad} copy constraint failures")

        # --- 3. range lookups: value < 2^lookup_bits ---
        lb = c.params.lookup_bits
        if lb is not None:
            bound = 1 << lb
            all_vals: list[int] = []
            for cols in c.lookup_cols:
                for vals in cols:
                    all_vals.extend(vals)
            for ph_idx, rows in enumerate(c.q_lookup_rows):
                if not rows or ph_idx >= len(c.phases) or not c.phases[ph_idx].columns:
                    continue
                col0 = c.phases[ph_idx].columns[0]
                for r in rows:
                    all_vals.append(col0[r] if r < len(col0) else 0)
            if all_vals:
                bad = sum(1 for v in all_vals if not (0 <= v < bound))
                if bad:
                    errors.append(f"{bad} lookup failures")
        return errors

    def assert_satisfied(self) -> None:
        errors = self.verify()
        assert not errors, "\n".join(errors)
