"""create_proof: the PlonKish KZG prover (SHPLONK multiopen, Blake2b FS).

Role of halo2-axiom's `create_proof::<KZGCommitmentScheme, ProverSHPLONK,
Challenge255, _, Blake2bWrite, _>` (SURVEY.md §2.9, §3.3). Hot paths run on
device: column IFFTs / extended-coset FFTs (ops/ntt.py), Pippenger MSM
commitments (ops/ec_device.py), and the quotient evaluation as batched
Montgomery-limb tensor math. Sequential scalar work (grand products, permuted
pairs, SHPLONK small-poly algebra) is exact host-int; it is O(n) with small
constants.

Protocol phases (must mirror verifier.py exactly):
  vk hash + instances -> advice commitments -> theta -> lookup permuted
  commitments -> beta, gamma -> permutation + lookup Z commitments -> random
  poly -> y -> quotient pieces -> x -> evals -> SHPLONK(v, w; H; u; Q).
"""

from __future__ import annotations

import random as _random

import jax.numpy as jnp

from ..gates.circuit import BaseCircuitBuilder, PhysicalCircuit
from ..utils.fields import FR_BN254
from .keygen import BLINDING_FACTORS, DELTA, ProvingKey
from .kzg import ParamsKZG
from .poly import domain as get_domain
from .protocol import (
    P,
    divide_by_linear,
    group_queries,
    lagrange_interpolate,
    perm_chunks,
    point_values,
    poly_eval,
    query_plan,
    usable_row_count,
    vanishing_poly,
)
from .transcript import Blake2bWrite


def _pad(col: list[int], n: int) -> list[int]:
    return list(col) + [0] * (n - len(col))


def _blind(col: list[int], n: int, rng) -> list[int]:
    """Fill the last BLINDING_FACTORS rows with random values (zk blinding)."""
    out = _pad(col, n)
    for r in range(n - BLINDING_FACTORS, n):
        out[r] = rng.randrange(P)
    return out


def _grand_product(numer: list[int], denom: list[int], u: int, n: int, rng) -> list[int]:
    """z[0]=1, z[i+1]=z[i]*numer[i]/denom[i] for i<u; blinding rows random."""
    # batch invert denominators
    pref = [1] * (u + 1)
    for i in range(u):
        pref[i + 1] = pref[i] * denom[i] % P
    inv_all = pow(pref[u], -1, P)
    inv = [0] * u
    for i in range(u - 1, -1, -1):
        inv[i] = pref[i] * inv_all % P
        inv_all = inv_all * denom[i] % P
    z = [0] * n
    z[0] = 1
    for i in range(u):
        z[i + 1] = z[i] * numer[i] % P * inv[i] % P
    for r in range(u + 1, n):
        z[r] = rng.randrange(P)
    return z


def _permute_pair(a_vals: list[int], s_vals: list[int], u: int, n: int, rng):
    """halo2 permute_expression_pair: sort input; align table (lookup/prover.rs)."""
    a_sorted = sorted(a_vals[:u])
    s_multiset: dict[int, int] = {}
    for v in s_vals[:u]:
        s_multiset[v] = s_multiset.get(v, 0) + 1
    s_out: list[int | None] = [None] * u
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            cnt = s_multiset.get(v, 0)
            if cnt == 0:
                raise ValueError(f"lookup failure: value {v} not in table")
            s_multiset[v] = cnt - 1
            s_out[i] = v
    leftovers = []
    for v, c in s_multiset.items():
        leftovers.extend([v] * c)
    it = iter(leftovers)
    for i in range(u):
        if s_out[i] is None:
            s_out[i] = next(it)
    a_p = _blind(a_sorted, n, rng)
    s_p = _blind([int(v) for v in s_out], n, rng)
    return a_p, s_p


def create_proof(
    params: ParamsKZG,
    pk: ProvingKey,
    builder_or_circuit,
    instances: list[list[int]] | None = None,
    seed: int = 0,
) -> bytes:
    vk = pk.vk
    k = vk.k
    n = 1 << k
    dom = get_domain(k)
    u = usable_row_count(n)
    rng = _random.Random(("create-proof-blinding", seed).__repr__())

    if isinstance(builder_or_circuit, BaseCircuitBuilder):
        circuit: PhysicalCircuit = builder_or_circuit.synthesize()
    else:
        circuit = builder_or_circuit
    if instances is None:
        instances = circuit.instances
    assert not vk.uses_q_lookup, (
        "single-advice-column q_lookup circuits are not supported by the real "
        "prover; allocate a lookup advice column (num_advice >= 2)"
    )

    # --- column values (host ints, length n) ---
    phase0 = circuit.phases[0] if circuit.phases else None
    advice_vals = []
    for i in range(vk.num_advice):
        col = phase0.columns[i] if phase0 and i < len(phase0.columns) else []
        advice_vals.append(_blind(col, n, rng))
    lookup_vals = []
    lkcols = circuit.lookup_cols[0] if circuit.lookup_cols else []
    for j in range(vk.num_lookup):
        col = lkcols[j] if j < len(lkcols) else []
        lookup_vals.append(_blind(col, n, rng))
    instance_vals = [_pad(col, n) for col in instances]
    while len(instance_vals) < vk.num_instance:
        instance_vals.append([0] * n)

    # --- transcript init ---
    tr = Blake2bWrite()
    tr.common_bytes(vk.hash())
    for col in instances:
        for v in col:
            tr.common_scalar(v)

    # --- helpers: commit a Lagrange-basis column on device ---
    poly_cache: dict[str, object] = {}  # label -> device coeffs [n,16]

    def to_coeffs(vals: list[int]):
        return dom.lagrange_to_coeff(dom.pack(vals))

    def commit_vals(label: str, vals: list[int]):
        coeffs = to_coeffs(vals)
        poly_cache[label] = coeffs
        return params.commit(dom.unpack(coeffs))

    # --- 1. advice commitments ---
    for i, vals in enumerate(advice_vals):
        tr.write_point(commit_vals(f"adv{i}", vals))
    for j, vals in enumerate(lookup_vals):
        tr.write_point(commit_vals(f"lkcol{j}", vals))

    tr.squeeze_challenge()  # theta (single-expression lookups; structural)

    # --- 2. lookup permuted columns ---
    lookup_permuted = []
    for j in range(vk.num_lookup):
        a_p, s_p = _permute_pair(lookup_vals[j], pk.table_col, u, n, rng)
        lookup_permuted.append((a_p, s_p))
        tr.write_point(commit_vals(f"lk{j}_a", a_p))
        tr.write_point(commit_vals(f"lk{j}_s", s_p))

    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()

    # --- 3. permutation grand products ---
    perm_cols = vk.perm_columns
    chunks = perm_chunks(len(perm_cols))

    def col_values(ref) -> list[int]:
        if ref.kind == "advice":
            return advice_vals[ref.index]
        if ref.kind == "lookup":
            return lookup_vals[ref.index]
        if ref.kind == "fixed":
            return pk.fixed_cols[ref.index]
        if ref.kind == "instance":
            return instance_vals[ref.index]
        raise ValueError(ref.kind)

    # omega powers and delta powers (host)
    omega_pows = [1] * n
    for r in range(1, n):
        omega_pows[r] = omega_pows[r - 1] * dom.omega % P

    perm_z: list[list[int]] = []
    last_z_end = 1
    for j, (s, e) in enumerate(chunks):
        numer = [1] * u
        denom = [1] * u
        for ci in range(s, e):
            vals = col_values(perm_cols[ci])
            sigma = pk.perm_values[ci]
            d_ci = pow(DELTA, ci, P)
            for r in range(u):
                numer[r] = numer[r] * ((vals[r] + beta * d_ci % P * omega_pows[r] + gamma) % P) % P
                denom[r] = denom[r] * ((vals[r] + beta * sigma[r] + gamma) % P) % P
        # Z(wX)*sigma_side = Z(X)*id_side -> z[i+1] = z[i] * id[i] / sigma[i]
        z = _grand_product(numer, denom, u, n, rng)
        # rescale so chunk j starts at previous chunk's end value
        if j > 0:
            z = [v * last_z_end % P for v in z[: u + 1]] + z[u + 1 :]
        last_z_end = z[u]
        perm_z.append(z)
        tr.write_point(commit_vals(f"permz{j}", z))

    # --- lookup grand products ---
    lookup_z: list[list[int]] = []
    for j in range(vk.num_lookup):
        a_p, s_p = lookup_permuted[j]
        a_in, t_in = lookup_vals[j], pk.table_col
        numer = [(a_in[r] + beta) % P * ((t_in[r] + gamma) % P) % P for r in range(u)]
        denom = [(a_p[r] + beta) % P * ((s_p[r] + gamma) % P) % P for r in range(u)]
        z = _grand_product(numer, denom, u, n, rng)
        lookup_z.append(z)
        tr.write_point(commit_vals(f"lk{j}_zl", z))

    # --- 4. vanishing random poly ---
    random_coeffs = [rng.randrange(P) for _ in range(n)]
    random_commit = params.commit(random_coeffs)
    poly_cache["random"] = dom.pack(random_coeffs)
    tr.write_point(random_commit)

    y = tr.squeeze_challenge()

    # --- 5. quotient on the extended coset (device) ---
    h_coeffs = _compute_quotient(
        dom, vk, pk, poly_cache, instance_vals, beta, gamma, y, u
    )
    # split into CS_DEGREE-1 = 3 pieces of n coefficients
    pieces = [h_coeffs[i * n : (i + 1) * n] for i in range(3)]
    h_piece_commits = [params.commit(piece) for piece in pieces]
    for c in h_piece_commits:
        tr.write_point(c)

    x = tr.squeeze_challenge()
    pts = point_values(x, k)

    # --- 6. evals ---
    plan = query_plan(vk)
    # materialize host coeffs for every opened poly
    host_coeffs: dict[str, list[int]] = {}

    def coeffs_of(label: str) -> list[int]:
        if label in host_coeffs:
            return host_coeffs[label]
        if label in poly_cache:
            c = dom.unpack(poly_cache[label])
        elif label.startswith("sigma"):
            c = dom.unpack(to_coeffs(pk.perm_values[int(label[5:])]))
        elif label.startswith("fix"):
            c = dom.unpack(to_coeffs(pk.fixed_cols[int(label[3:])]))
        elif label.startswith("sel"):
            c = dom.unpack(to_coeffs(pk.selectors[int(label[3:])]))
        elif label == "table":
            c = dom.unpack(to_coeffs(pk.table_col))
        elif label == "h":
            # combined h poly: sum x^{n i} h_i
            xc = pow(x, n, P)
            c = [0] * n
            scale = 1
            for piece in pieces:
                for d, cv in enumerate(piece):
                    c[d] = (c[d] + scale * cv) % P
                scale = scale * xc % P
        else:
            raise KeyError(label)
        host_coeffs[label] = c
        return c

    evals: dict[str, dict[str, int]] = {}
    for label, pts_labels in plan:
        coeffs = coeffs_of(label)
        evals[label] = {}
        for pl in pts_labels:
            ev = dom.eval_coeffs_host(coeffs, pts[pl])
            evals[label][pl] = ev
            tr.write_scalar(ev)

    # --- 7. SHPLONK multiopen ---
    v = tr.squeeze_challenge()
    w_ch = tr.squeeze_challenge()
    groups = group_queries(plan)

    g_polys = []
    g_evals = []  # per group: {point_label: eval}
    for pts_labels, labels in groups:
        g = [0] * n
        ge = {pl: 0 for pl in pts_labels}
        vpow = 1
        for label in labels:
            c = coeffs_of(label)
            for d, cv in enumerate(c):
                g[d] = (g[d] + vpow * cv) % P
            for pl in pts_labels:
                ge[pl] = (ge[pl] + vpow * evals[label][pl]) % P
            vpow = vpow * v % P
        g_polys.append(g)
        g_evals.append(ge)

    # H = sum_j w^j (g_j - r_j) / Z_{S_j}
    h_open = [0] * n
    wpow = 1
    for (pts_labels, _), g, ge in zip(groups, g_polys, g_evals):
        pvals = [pts[pl] for pl in pts_labels]
        r = lagrange_interpolate(pvals, [ge[pl] for pl in pts_labels])
        num = list(g)
        for d, cv in enumerate(r):
            num[d] = (num[d] - cv) % P
        quot = num
        for s in pvals:
            quot = divide_by_linear(quot, s)
        for d, cv in enumerate(quot):
            h_open[d] = (h_open[d] + wpow * cv) % P
        wpow = wpow * w_ch % P
    h_open_commit = params.commit(h_open)
    tr.write_point(h_open_commit)

    u_ch = tr.squeeze_challenge()

    # L = sum_j w^j Z_{T\S_j}(u) (g_j - r_j(u)) - Z_T(u) H
    all_points = sorted({pts[pl] for plan_pts, _ in groups for pl in plan_pts})
    zt_u = poly_eval(vanishing_poly(all_points), u_ch)
    L = [0] * n
    wpow = 1
    for (pts_labels, _), g, ge in zip(groups, g_polys, g_evals):
        pvals = [pts[pl] for pl in pts_labels]
        others = [pt for pt in all_points if pt not in pvals]
        z_other_u = poly_eval(vanishing_poly(others), u_ch)
        r = lagrange_interpolate(pvals, [ge[pl] for pl in pts_labels])
        r_u = poly_eval(r, u_ch)
        scale = wpow * z_other_u % P
        for d, cv in enumerate(g):
            L[d] = (L[d] + scale * cv) % P
        L[0] = (L[0] - scale * r_u) % P
        wpow = wpow * w_ch % P
    for d, cv in enumerate(h_open):
        L[d] = (L[d] - zt_u * cv) % P
    # Q = L / (X - u)
    Q = divide_by_linear(L, u_ch)
    q_commit = params.commit(Q)
    tr.write_point(q_commit)

    return tr.finalize()


def _compute_quotient(dom, vk, pk, poly_cache, instance_vals, beta, gamma, y, u):
    """All constraint expressions on the 4n coset, y-RLC'd, / Z_H. Device math.

    Must follow protocol.expected_quotient_eval's ordering exactly. Expressions
    are folded into the accumulator as they are produced (acc = acc*y + e) so
    peak memory stays at a few extended columns.
    """
    n = dom.n

    # extended evals of every needed poly
    ext: dict[str, object] = {}

    def ext_of(label: str, coeffs=None, vals=None):
        if label in ext:
            return ext[label]
        if coeffs is None:
            if vals is not None:
                coeffs = dom.lagrange_to_coeff(dom.pack(vals))
            elif label.startswith("inst"):
                coeffs = dom.lagrange_to_coeff(dom.pack(instance_vals[int(label[4:])]))
            else:
                coeffs = poly_cache[label]
        e = dom.coeff_to_extended(coeffs)
        ext[label] = e
        return e

    # lagrange selector polys l_0, l_last, l_active on the coset
    l0_vals = [0] * n
    l0_vals[0] = 1
    llast_vals = [0] * n
    llast_vals[u] = 1
    lactive_vals = [1 if r < u else 0 for r in range(n)]
    l0_e = ext_of("__l0", vals=l0_vals)
    llast_e = ext_of("__llast", vals=llast_vals)
    lactive_e = ext_of("__lactive", vals=lactive_vals)

    one_e = dom.const_ext(1)

    # incremental y-RLC accumulator (Horner): acc = acc * y + expr
    state = {"acc": dom.const_ext(0)}
    y_e = dom.const_ext(y)

    def emit(e):
        state["acc"] = dom.add(dom.mul(state["acc"], y_e), e)

    # 1. gates
    for i in range(vk.num_advice):
        q_e = ext_of(f"sel{i}", vals=pk.selectors[i])
        a_e = ext_of(f"adv{i}")
        a_w = dom.rotate_ext(a_e, 1)
        a_w2 = dom.rotate_ext(a_e, 2)
        a_w3 = dom.rotate_ext(a_e, 3)
        expr = dom.sub(dom.add(a_e, dom.mul(a_w, a_w2)), a_w3)
        emit(dom.mul(q_e, expr))

    # 2. permutation
    perm_cols = vk.perm_columns
    chunks = perm_chunks(len(perm_cols))
    if chunks:
        z_exts = [ext_of(f"permz{j}") for j in range(len(chunks))]
        emit(dom.mul(l0_e, dom.sub(one_e, z_exts[0])))
        zl = z_exts[-1]
        emit(dom.mul(llast_e, dom.sub(dom.mul(zl, zl), zl)))
        for j in range(1, len(chunks)):
            zprev_rot = dom.rotate_ext(z_exts[j - 1], u)
            emit(dom.mul(l0_e, dom.sub(z_exts[j], zprev_rot)))

        def col_ext(ref):
            if ref.kind == "advice":
                return ext_of(f"adv{ref.index}")
            if ref.kind == "lookup":
                return ext_of(f"lkcol{ref.index}")
            if ref.kind == "fixed":
                return ext_of(f"fix{ref.index}", vals=pk.fixed_cols[ref.index])
            if ref.kind == "instance":
                return ext_of(f"inst{ref.index}")
            raise ValueError(ref.kind)

        # X on the coset: values g * w_ext^i -> poly X has coeffs [0, 1]
        x_poly = dom.coeff_to_extended(dom.pack([0, 1]))
        beta_e = dom.const_ext(beta)
        gamma_e = dom.const_ext(gamma)
        for j, (s, e) in enumerate(chunks):
            left = dom.rotate_ext(z_exts[j], 1)
            right = z_exts[j]
            for ci in range(s, e):
                v_e = col_ext(perm_cols[ci])
                sigma_e = ext_of(f"sigma{ci}", vals=pk.perm_values[ci])
                left = dom.mul(left, dom.add(dom.add(v_e, dom.mul(beta_e, sigma_e)), gamma_e))
                d_ci = pow(DELTA, ci, P)
                id_term = dom.mul(dom.const_ext(beta * d_ci % P), x_poly)
                right = dom.mul(right, dom.add(dom.add(v_e, id_term), gamma_e))
            emit(dom.mul(lactive_e, dom.sub(left, right)))

    # 3. lookups
    for j in range(vk.num_lookup):
        z_e = ext_of(f"lk{j}_zl")
        z_w = dom.rotate_ext(z_e, 1)
        a_p = ext_of(f"lk{j}_a")
        a_p_prev = dom.rotate_ext(a_p, -1)
        s_p = ext_of(f"lk{j}_s")
        a_in = ext_of(f"lkcol{j}")
        t_in = ext_of("table", vals=pk.table_col)
        beta_e = dom.const_ext(beta)
        gamma_e = dom.const_ext(gamma)
        emit(dom.mul(l0_e, dom.sub(one_e, z_e)))
        emit(dom.mul(llast_e, dom.sub(dom.mul(z_e, z_e), z_e)))
        left = dom.mul(dom.mul(z_w, dom.add(a_p, beta_e)), dom.add(s_p, gamma_e))
        right = dom.mul(dom.mul(z_e, dom.add(a_in, beta_e)), dom.add(t_in, gamma_e))
        emit(dom.mul(lactive_e, dom.sub(left, right)))
        emit(dom.mul(l0_e, dom.sub(a_p, s_p)))
        emit(
            dom.mul(dom.mul(lactive_e, dom.sub(a_p, s_p)), dom.sub(a_p, a_p_prev))
        )

    h_ext = dom.divide_by_vanishing(state["acc"])
    h_coeffs_dev = dom.extended_to_coeff(h_ext)
    h_coeffs = dom.unpack(h_coeffs_dev)
    # degree must be < 3n
    assert all(c == 0 for c in h_coeffs[3 * n :]), "quotient degree overflow"
    return h_coeffs[: 3 * n]
