"""Phase-0 witness/commit pipelining: overlap witgen with column commits.

The honest e2e proving time includes witness regeneration (host Python)
followed by the phase-0 advice flatten + upload + native commit. The
commit (threaded C Pippenger) and the upload DMA hold no GIL, so they can
run WHILE the witness closure is still executing: a watcher thread
incrementally replays the pinned break-point schedule over the growing
main Context, and every column that completes is blinded, uploaded (async
u16) and committed immediately. By the time the closure returns, all but
the tail columns are done.

Determinism: blinding values are pre-drawn from the exact rng stream
create_proof would use (create_proof then skips the same number of draws),
break-point replay duplicates boundary cells exactly like
threads.flatten_witnesses, and the pipelined proof is asserted
byte-identical to the plain proof in tests/test_pipeline.py.

Scope: phase-0 advice of a PROVER-stage builder on a single device (the
reference's hot bench path — testing.rs:198-247 regenerates the witness
inside the timed region). The watcher only consumes values from the main
context while it is the only context; any parallelize_core contexts are
drained after the closure returns (same flat-stream order either way).
"""

from __future__ import annotations

import random as _random
import threading
import time as _time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax.numpy as jnp

from .keygen import BLINDING_FACTORS
from .protocol import P, usable_row_count


class Phase0Pipeline:
    """Collects pipelined phase-0 results for create_proof(phase0=...)."""

    def __init__(self, params, pk, builder, seed: int = 0):
        vk = pk.vk
        assert builder.witness_gen_only(), "pipeline needs a PROVER-stage builder"
        self.params = params
        self.pk = pk
        self.builder = builder
        self.seed = seed
        self.n = 1 << vk.k
        self.u = usable_row_count(self.n)
        na_p = vk.num_advice_per_phase or [vk.num_advice]
        self.na0 = na_p[0]
        self.break_points = list(pk.break_points[0]) if pk.break_points else []
        # pre-draw the phase-0 advice blinding in create_proof's rng order
        rng = _random.Random(("create-proof-blinding", seed).__repr__())
        self.blinds = [
            [rng.randrange(P) for _ in range(BLINDING_FACTORS)] for _ in range(self.na0)
        ]
        # results (index = column)
        self.advice_cols: list = [None] * self.na0
        self.u16_parts: list = [None] * self.na0
        self.commit_rows: list = [None] * self.na0
        if params._native_msm() is None:
            raise RuntimeError("phase-0 pipelining needs the native commit engine")
        params._msm_base_blob(True)  # build the native base blob pre-threading
        self._done = threading.Event()
        self._ex = ThreadPoolExecutor(max_workers=2)
        self._futs: list = []

    # --- column sink -------------------------------------------------------
    def _process_col(self, c: int, vals: list[int]):
        from .prover import _u16_cols

        n = self.n
        out = list(vals) + [0] * (n - len(vals))
        out[n - BLINDING_FACTORS :] = self.blinds[c]
        self.advice_cols[c] = out
        u16 = _u16_cols([out], n)
        self.u16_parts[c] = jnp.asarray(u16)  # async upload
        rows = self.params.commit_host_ints([out], True)
        self.commit_rows[c] = None if rows is None else rows[0]

    def _submit(self, c: int, vals: list[int]):
        self._futs.append(self._ex.submit(self._process_col, c, vals))

    # --- incremental break-point replay ------------------------------------
    def _run_watcher(self):
        from ..gates.threads import batch_evaluate

        pm = self.builder.core.phase_manager[0]
        field = self.builder.field
        bps = iter(self.break_points)
        bp = next(bps, None)
        col_vals: list[int] = []
        col_idx = 0
        row_offset = 0
        consumed = 0  # values consumed from threads[0]

        def feed(values):
            nonlocal bp, col_vals, col_idx, row_offset
            for value in values:
                col_vals.append(value)
                if bp == row_offset:
                    bp = next(bps, None)
                    row_offset = 0
                    done_col, col_vals = col_vals, [value]
                    self._submit(col_idx, done_col)
                    col_idx += 1
                row_offset += 1

        while not self._done.is_set():
            threads = pm.threads
            if threads and len(threads) == 1:
                avail = len(threads[0].advice)
                if avail - consumed >= 4096:
                    chunk = threads[0].advice[consumed:avail]
                    feed(batch_evaluate(chunk, field))
                    consumed = avail
                    continue
            _time.sleep(0.002)

        # drain: finish threads[0], then any later contexts, then the tail
        threads = pm.threads
        if threads:
            chunk = threads[0].advice[consumed:]
            feed(batch_evaluate(chunk, field))
            for ctx in threads[1:]:
                feed(batch_evaluate(ctx.advice, field))
        if col_vals or col_idx == 0:
            self._submit(col_idx, col_vals)
            col_idx += 1
        self._ncols_seen = col_idx

    # --- driver ------------------------------------------------------------
    def run(self, witness_fn):
        """witness_fn(builder) in the calling thread, columns committed as
        they complete; returns self (pass as create_proof(phase0=...))."""
        watcher = threading.Thread(target=self._run_watcher, daemon=True)
        watcher.start()
        try:
            witness_fn(self.builder)
        finally:
            self._done.set()
            watcher.join()
        for f in self._futs:
            f.result()
        self._ex.shutdown()
        assert self._ncols_seen == self.na0, (
            f"pipelined replay produced {self._ncols_seen} columns, "
            f"config says {self.na0}"
        )
        assert all(v is not None for v in self.advice_cols)
        return self


def prove_pipelined(params, pk, builder, witness_fn, seed: int = 0, **kw) -> bytes:
    """Run witness_fn while phase-0 columns flatten/upload/commit in the
    background, then create_proof with the precomputed phase-0 payload."""
    from .prover import create_proof

    pipe = Phase0Pipeline(params, pk, builder, seed).run(witness_fn)
    return create_proof(params, pk, builder, seed=seed, phase0=pipe, **kw)
