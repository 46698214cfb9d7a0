"""Key generation: VerifyingKey / ProvingKey for the PlonKish KZG prover.

Role of halo2-axiom's `keygen_vk` / `keygen_pk` (SURVEY.md §2.9). From a
synthesized `PhysicalCircuit` we derive:
  * the fixed polynomials: one selector poly per gate-advice column, the
    constant (fixed) columns, and the range-lookup table column;
  * the permutation argument: equality-enabled columns (gate advice, lookup
    advice, fixed, instance), cycle-closed sigma polynomials over delta-coset
    labels (halo2's permutation keygen);
  * commitments to all of the above (the verifying key).

Constraint-system shape (BaseConfig, gates/circuit.py):
  gate per advice column i:  q_i * (a_i + a_i(w) * a_i(w2) - a_i(w3))
  lookup per lookup column j: L_j in table T   (plus optional q_lookup * a_0)
  permutation over all equality-enabled columns.
Degree 4 (lookup active-row constraint) -> extended domain 4n, permutation
chunk length 2, blinding factors B = 8 (usable rows n - 9, matching the
builder's DEFAULT_MINIMUM_ROWS, circuit.py:24).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field as dc_field

from ..gates.circuit import BaseCircuitBuilder, PhysicalCircuit
from ..utils.fields import FR_BN254
from .kzg import ParamsKZG
from .poly import domain as get_domain

BLINDING_FACTORS = 8
CS_DEGREE = 4
PERM_CHUNK = CS_DEGREE - 2  # halo2: chunk = degree - 2

# delta: generator of the "extended" coset labels (halo2curves Fr::DELTA = g^{2^S})
DELTA = pow(FR_BN254.generator, 1 << FR_BN254.s, FR_BN254.p)


@dataclass
class ColumnRef:
    """A permutation-participating column: kind in {advice, lookup, fixed, instance}."""

    kind: str
    index: int  # flat index within kind (phase folded in for advice/lookup)

    def key(self):
        return (self.kind, self.index)


@dataclass
class VerifyingKey:
    k: int
    params_n: int
    num_advice: int
    num_lookup: int
    num_fixed: int
    num_instance: int
    lookup_bits: int | None
    uses_q_lookup: bool
    selector_commitments: list
    fixed_commitments: list
    table_commitment: object | None
    q_lookup_commitment: object | None
    permutation_commitments: list
    perm_columns: list[ColumnRef] = dc_field(default_factory=list)

    def to_bytes(self) -> bytes:
        """Canonical byte serialization (role of halo2's vk.write: shape
        header + every commitment point; no Python repr anywhere)."""

        def pt(b, p):
            if p is None:
                b += b"\x00" * 64
            else:
                b += p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little")
            return b

        out = bytearray(b"halo2_lib_tpu_vk_v1")
        for v in (
            self.k, self.params_n, self.num_advice, self.num_lookup,
            self.num_fixed, self.num_instance,
            -1 if self.lookup_bits is None else self.lookup_bits,
            1 if self.uses_q_lookup else 0,
            len(self.perm_columns),
        ):
            out += int(v).to_bytes(8, "little", signed=True)
        for c in self.perm_columns:
            out += c.kind.encode() + b"\x00" + int(c.index).to_bytes(4, "little")
        for group in (
            self.selector_commitments,
            self.fixed_commitments,
            [self.table_commitment, self.q_lookup_commitment],
            self.permutation_commitments,
        ):
            out += len(group).to_bytes(4, "little")
            for p in group:
                out = pt(out, p)
        return bytes(out)

    def hash(self) -> bytes:
        h = hashlib.blake2b(person=b"Halo2-VKey-Hash")
        h.update(self.to_bytes())
        return h.digest()


@dataclass
class ProvingKey:
    vk: VerifyingKey
    # host int column values, length n each
    selectors: list[list[int]]
    fixed_cols: list[list[int]]
    table_col: list[int] | None
    q_lookup_col: list[int] | None
    perm_values: list[list[int]]  # sigma column values (length n, host ints)
    break_points: list[list[int]]
    config_params: object


def _perm_columns(circuit: PhysicalCircuit) -> list[ColumnRef]:
    cols: list[ColumnRef] = []
    na = circuit.params.num_advice_per_phase[0] if circuit.params.num_advice_per_phase else 0
    nl = (
        circuit.params.num_lookup_advice_per_phase[0]
        if circuit.params.num_lookup_advice_per_phase
        else 0
    )
    for i in range(na):
        cols.append(ColumnRef("advice", i))
    for i in range(nl):
        cols.append(ColumnRef("lookup", i))
    for i in range(circuit.params.num_fixed):
        cols.append(ColumnRef("fixed", i))
    for i in range(circuit.params.num_instance_columns):
        cols.append(ColumnRef("instance", i))
    return cols


def _build_permutation(circuit: PhysicalCircuit, n: int, cols: list[ColumnRef]) -> list[list[int]]:
    """halo2 permutation keygen: label cell (c, r) with delta^c * omega^r, close
    copy cycles, sigma_c(row) = label of the next cell in the cycle."""
    p = FR_BN254.p
    dom = get_domain(circuit.params.k)
    col_pos = {c.key(): i for i, c in enumerate(cols)}

    # union-find over (col_idx, row)
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    def to_cell(phys):
        kind, phase, col, row = phys
        assert phase == 0, "permutation supports phase 0 (BaseCircuitBuilder drives phase 0)"
        return (col_pos[(kind, col)], row)

    for left, right in circuit.copies:
        union(to_cell(left), to_cell(right))

    # group cycle members
    groups: dict = {}
    for cell in list(parent.keys()):
        groups.setdefault(find(cell), []).append(cell)

    # identity mapping by default: sigma_c[r] = delta^c w^r
    omegas = [1] * n
    w = dom.omega
    for r in range(1, n):
        omegas[r] = omegas[r - 1] * w % p
    deltas = [1] * len(cols)
    for c in range(1, len(cols)):
        deltas[c] = deltas[c - 1] * DELTA % p

    sigma = [[deltas[c] * omegas[r] % p for r in range(n)] for c in range(len(cols))]
    for root, members in groups.items():
        if root not in members:
            members.append(root)
        members = sorted(set(members))
        # cyclic shift: sigma(cell_i) = label(cell_{i+1})
        for i, (c, r) in enumerate(members):
            nc, nr = members[(i + 1) % len(members)]
            sigma[c][r] = deltas[nc] * omegas[nr] % p
    return sigma


def _pad(col: list[int], n: int) -> list[int]:
    assert len(col) <= n
    return list(col) + [0] * (n - len(col))


def keygen(params: ParamsKZG, builder: BaseCircuitBuilder, circuit: PhysicalCircuit | None = None) -> ProvingKey:
    """keygen_pk2-equivalent: synthesize once, derive vk+pk (utils/halo2.rs:135)."""
    if circuit is None:
        circuit = builder.synthesize()
    k = circuit.params.k
    n = 1 << k
    assert params.k >= k, "SRS too small for circuit"
    dom = get_domain(k)

    na = circuit.params.num_advice_per_phase[0] if circuit.params.num_advice_per_phase else 0
    nl = (
        circuit.params.num_lookup_advice_per_phase[0]
        if circuit.params.num_lookup_advice_per_phase
        else 0
    )

    # selectors per gate column
    phase0 = circuit.phases[0] if circuit.phases else None
    selectors = []
    for i in range(na):
        sel = [0] * n
        if phase0 and i < len(phase0.selectors):
            for r, q in enumerate(phase0.selectors[i]):
                sel[r] = 1 if q else 0
        selectors.append(sel)

    fixed_cols = [_pad(c, n) for c in circuit.fixed_cols]

    lookup_bits = circuit.params.lookup_bits
    uses_q_lookup = any(circuit.q_lookup_rows)
    table_col = None
    q_lookup_col = None
    if lookup_bits is not None and (nl > 0 or uses_q_lookup):
        table_col = _pad(list(range(1 << lookup_bits)), n)
        assert (1 << lookup_bits) <= n - BLINDING_FACTORS - 1, "lookup table too big for k"
    if uses_q_lookup:
        q_lookup_col = [0] * n
        for r in circuit.q_lookup_rows[0]:
            q_lookup_col[r] = 1

    perm_cols = _perm_columns(circuit)
    sigma = _build_permutation(circuit, n, perm_cols)

    # commitments: ALL pk columns in ONE batched Lagrange-basis MSM dispatch
    import jax

    import jax.numpy as jnp

    from ..ops.ec_device import DeviceCurve  # noqa: F401 (device path)
    from .prover import _affine_canonical, _host_points, _u16_cols

    all_cols = list(selectors) + list(fixed_cols)
    if table_col is not None:
        all_cols.append(table_col)
    if q_lookup_col is not None:
        all_cols.append(q_lookup_col)
    all_cols.extend(sigma)
    df = dom.df
    dc = params.device_curve()

    @jax.jit
    def _commit_all(cols_u16, bases):
        lag = df._to_mont(cols_u16.astype(jnp.uint32))
        com = params.commit_many_inside(df, lag, True, bases=bases)
        return _affine_canonical(dc, com)

    pts = _host_points(
        dc, _commit_all(jnp.asarray(_u16_cols(all_cols, n)), params.affine_lagrange_bases())
    )
    o = 0
    selector_commitments = pts[o : o + len(selectors)]
    o += len(selectors)
    fixed_commitments = pts[o : o + len(fixed_cols)]
    o += len(fixed_cols)
    table_commitment = None
    if table_col is not None:
        table_commitment = pts[o]
        o += 1
    q_lookup_commitment = None
    if q_lookup_col is not None:
        q_lookup_commitment = pts[o]
        o += 1
    permutation_commitments = pts[o:]

    vk = VerifyingKey(
        k=k,
        params_n=params.n,
        num_advice=na,
        num_lookup=nl,
        num_fixed=circuit.params.num_fixed,
        num_instance=circuit.params.num_instance_columns,
        lookup_bits=lookup_bits,
        uses_q_lookup=uses_q_lookup,
        selector_commitments=selector_commitments,
        fixed_commitments=fixed_commitments,
        table_commitment=table_commitment,
        q_lookup_commitment=q_lookup_commitment,
        permutation_commitments=permutation_commitments,
        perm_columns=perm_cols,
    )
    break_points = []
    try:
        break_points = builder.break_points()
    except AssertionError:
        pass
    return ProvingKey(
        vk=vk,
        selectors=selectors,
        fixed_cols=fixed_cols,
        table_col=table_col,
        q_lookup_col=q_lookup_col,
        perm_values=sigma,
        break_points=break_points,
        config_params=circuit.params,
    )
