"""OptimalControlProblem: multi-phase container with link constraints.

Reference: `src/OptimalControl/OptimalControlProblem.{h,cpp}` +
`LinkFunction.h`.  One flat variable vector
[phase0 vars | phase1 vars | ... | link params]; phases couple only through
link-constraint rows — the sharding seam for multi-chip distribution
(SURVEY.md section 2.9 P6).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..Solvers.nlp import NonLinearProgram, IndexedFunction
from ..Solvers.psiopt import PSIOPT, ConvergenceFlags
from ..VectorFunctions.function import VectorFunction
from .phase import Phase, _canon_region, _tracefun

__all__ = ["OptimalControlProblem", "LinkFlags"]


class LinkFlags:
    BackToFront = "BackToFront"
    FrontToBack = "FrontToBack"
    FrontToFront = "FrontToFront"
    BackToBack = "BackToBack"
    LinkParams = "LinkParams"
    PathToPath = "PathToPath"


class OptimalControlProblem:

    def __init__(self):
        self.Phases: list[Phase] = []
        self._phase_names = {}
        self.optimizer = PSIOPT()
        self._link_params = np.zeros(0)
        self._link_specs = []
        self.AdaptiveMesh = False
        self.Threads = 1
        self.JetJobMode = "optimize"

    # ----------------------------------------------------------- phase admin
    def addPhase(self, phase, name=None):
        self.Phases.append(phase)
        if name is not None:
            self._phase_names[name] = phase
        return phase

    def addPhases(self, phases):
        for p in phases:
            self.addPhase(p)
        return phases

    def removePhase(self, which):
        p = self._phase(which)
        self.Phases.remove(p)

    def Phase(self, i):
        return self._phase(i)

    def _phase(self, p):
        if isinstance(p, Phase):
            return p
        if isinstance(p, str):
            return self._phase_names[p]
        return self.Phases[int(p)]

    def _phase_index(self, p):
        return self.Phases.index(self._phase(p))

    # ------------------------------------------------------------ link params
    def setLinkParams(self, vals):
        self._link_params = np.asarray(vals, dtype=np.float64).ravel()

    def returnLinkParams(self):
        return self._link_params.copy()

    # ----------------------------------------------------------- link builder
    def _boundary_gather(self, phase, offset, which):
        """Global indices + tau for one phase boundary: [node vars, t0, tf,
        op, sp] shifted by the phase's offset."""
        node = 0 if which == "Front" else phase.numNodes - 1
        tau = 0.0 if which == "Front" else 1.0
        m = phase._m
        idx = [offset + node * m + i for i in range(m)]
        idx += [offset + phase._t0i, offset + phase._tfi]
        idx += [offset + phase._opi(k) for k in range(phase.PV)]
        idx += [offset + phase._spi(k) for k in range(phase.SPV)]
        return idx, tau

    def _boundary_input(self, phase, g, lo, tau):
        """Build [x, t, u, op, sp] for one phase boundary from gathered g
        starting at lo; returns (input_parts, next_lo)."""
        m = phase._m
        XV, UV = phase.XV, phase.UV
        x = g[lo:lo + XV]
        u = g[lo + XV:lo + m]
        t0 = g[lo + m]
        tf = g[lo + m + 1]
        t = t0 * (1.0 - tau) + tf * tau
        rest = g[lo + m + 2:lo + m + 2 + phase.PV + phase.SPV]
        return [x, t[None], u, rest], lo + m + 2 + phase.PV + phase.SPV

    # ------------------------------------------------------------- link API
    def addForwardLinkEqualCon(self, p0, p1, vars_):
        """Continuity chain: for each consecutive phase pair between p0 and
        p1, back-vars == front-vars for XtU indices `vars_`
        (reference `OptimalControlProblem.h:580-861`)."""
        i0 = self._phase_index(p0)
        i1 = self._phase_index(p1)
        if i1 < 0:
            i1 = len(self.Phases) + i1
        vars_ = list(self.Phases[i0]._resolve_idx(vars_))
        for k in range(i0, i1):
            self.addDirectLinkEqualCon(k, "Back", vars_, k + 1, "Front",
                                       vars_)
        return len(self._link_specs) - 1

    def addDirectLinkEqualCon(self, *args):
        """addDirectLinkEqualCon(p0, reg0, vars0, p1, reg1, vars1) or
        (func, p0, reg0, vars0, p1, reg1, vars1)."""
        if len(args) == 6:
            pa, ra, va, pb, rb, vb = args
            func = None
        elif len(args) == 7:
            func, pa, ra, va, pb, rb, vb = args
        else:
            raise TypeError("addDirectLinkEqualCon: bad arguments")
        self._link_specs.append(
            ("direct", func, self._phase(pa), _canon_region(ra),
             np.asarray(list(va), np.int32),
             self._phase(pb), _canon_region(rb),
             np.asarray(list(vb), np.int32)))
        return len(self._link_specs) - 1

    def addLinkEqualCon(self, func, *args):
        """General link constraint over boundary regions of several phases:

        * addLinkEqualCon(func, [(phase, region), ...])
        * addLinkEqualCon(func, phase0, reg0, phase1, reg1, ...)
        * addLinkEqualCon(func, [(phase, region, XtUVars, OPVars, SPVars),
          ...], LinkParams) — the reference's index-selected form
          (`OptimalControlProblem.h:530-817`): the function input is the
          concatenation of each phase tuple's selected boundary variables
          followed by the selected link parameters.
        """
        if len(args) >= 1 and isinstance(args[0], (list, tuple)) and \
                len(args[0]) and isinstance(args[0][0], (list, tuple)) and \
                len(args[0][0]) >= 3:
            sel = []
            for tup in args[0]:
                p, r = tup[0], tup[1]
                xtuv = np.asarray(list(tup[2]), np.int32) if len(tup) > 2 \
                    else np.zeros(0, np.int32)
                opv = np.asarray(list(tup[3]), np.int32) if len(tup) > 3 \
                    else np.zeros(0, np.int32)
                spv = np.asarray(list(tup[4]), np.int32) if len(tup) > 4 \
                    else np.zeros(0, np.int32)
                sel.append((self._phase(p), _canon_region(r), xtuv, opv,
                            spv))
            lp = np.asarray(list(args[1]), np.int32) if len(args) > 1 \
                else np.zeros(0, np.int32)
            self._link_specs.append(("general_idx", func, sel, lp))
            return len(self._link_specs) - 1
        if len(args) == 1 and isinstance(args[0], (list, tuple)):
            pr = [(self._phase(p), _canon_region(r)) for p, r in args[0]]
        else:
            pr = [(self._phase(args[i]), _canon_region(args[i + 1]))
                  for i in range(0, len(args), 2)]
        self._link_specs.append(("general", func, pr))
        return len(self._link_specs) - 1

    def addLinkParamEqualCon(self, func, pidx):
        """Equality on link params selected by pidx."""
        self._link_specs.append(
            ("linkparams", func, np.asarray(list(pidx), np.int32)))
        return len(self._link_specs) - 1

    def addLinkObjective(self, func, *args):
        if len(args) == 1 and isinstance(args[0], (list, tuple)) and \
                len(args[0]) and isinstance(args[0][0], (list, tuple)):
            pr = [(self._phase(p), _canon_region(r)) for p, r in args[0]]
        else:
            pr = [(self._phase(args[i]), _canon_region(args[i + 1]))
                  for i in range(0, len(args), 2)]
        self._link_specs.append(("objective", func, pr))
        return len(self._link_specs) - 1

    def setKKTBackend(self, backend, mesh=None, axis="seg"):
        """Select the multi-phase KKT backend: 'block' | 'sharded' |
        'dense' (see `ODEPhaseBase.setKKTBackend`).  'sharded'
        distributes the concatenated phase chain segment-axis over the
        mesh; phases are consecutive spans of one global node chain, so
        the shard seam is the SURVEY section 2.9 P6 block boundary."""
        backend = str(backend)
        if backend not in ("block", "sharded", "dense"):
            raise ValueError(f"unknown KKT backend {backend!r}")
        if backend == "sharded":
            if mesh is None:
                from jax.sharding import Mesh
                mesh = Mesh(np.array(jax.devices()), (axis,))
            self.KKTMesh = mesh
            self.KKTAxis = axis
        self.KKTBackend = backend
        return self

    # ------------------------------------------------------------ transcribe
    def transcribe(self, *_):
        key = (tuple(p._structure_key() for p in self.Phases),
               tuple(id(s) for s in self._link_specs),
               getattr(self, "KKTBackend", "block"),
               id(getattr(self, "KKTMesh", None)),
               self._link_params.size)
        if getattr(self, "_nlp", None) is not None and \
                key == getattr(self, "_ocp_struct_key", None):
            # structure unchanged: refresh runtime consts only (the shifted
            # families share the phase families' consts buffers)
            for p in self.Phases:
                p._refresh_consts(self._nlp)
            return
        offsets = []
        off = 0
        for p in self.Phases:
            if p._traj is None:
                raise ValueError("every phase needs an initial trajectory")
            offsets.append(off)
            off += p.numVars
        self._lp_offset = off
        nvars = off + self._link_params.size
        nlp = NonLinearProgram(nvars)

        # global unit vector (auto-scaled phases expose scaled variables;
        # link functions must see physical values)
        self._Uglob = np.ones(nvars)
        for p, o in zip(self.Phases, offsets):
            if p.AutoScaling:
                self._Uglob[o:o + p.numVars] = p.var_units()
        for p, o in zip(self.Phases, offsets):
            eqs, iqs, objs = p._build_families()
            for fam in eqs:
                nlp.addEqualCon(self._shift(fam, o))
            for fam in iqs:
                nlp.addInequalCon(self._shift(fam, o))
            for fam in objs:
                nlp.addObjective(self._shift(fam, o))

        for spec in self._link_specs:
            self._transcribe_link(nlp, spec, offsets)

        nlp.freeze()
        self._nlp = nlp
        self._offsets = offsets
        kkt = None
        backend = getattr(self, "KKTBackend", "block")
        if backend in ("block", "sharded"):
            # phases become consecutive spans of one global node chain, so
            # BackToFront links couple adjacent nodes and the whole
            # multi-phase KKT stays block-tridiagonal (+ border for link
            # params and long-range links) — the sharding seam of
            # SURVEY.md section 2.9 P6.
            nov = np.full(nvars, -1, np.int32)
            node_off = 0
            for p, o in zip(self.Phases, offsets):
                pn = p.node_of_var()
                nov[o:o + p.numVars] = np.where(pn >= 0, pn + node_off, -1)
                node_off += p.numNodes
            try:
                from ..Solvers.kkt_block import BlockKKT
                kkt = BlockKKT(nlp, nov, x0=self._make_input())
                if backend == "sharded":
                    from ..Solvers.kkt_sharded import ShardedBlockKKT
                    kkt = ShardedBlockKKT(kkt, self.KKTMesh,
                                          getattr(self, "KKTAxis", "seg"))
            except ValueError as e:
                if self.optimizer.PrintLevel <= 1:
                    print(f"  [kkt] falling back to dense backend: {e}")
                kkt = None
        self.optimizer.setNLP(nlp, kkt)
        self._ocp_struct_key = key
        for p in self.Phases:
            p._active_nlp = nlp

    @staticmethod
    def _shift(fam: IndexedFunction, offset):
        return IndexedFunction(fam.fun, fam.Vidx + np.int32(offset),
                               fam.consts, name=fam.name)

    def _region_pack(self, phase, offset, region):
        """Gather spec for one phase region used in links: Front/Back/
        ODEParams/StaticParams."""
        if region in ("Front", "Back"):
            idx, tau = self._boundary_gather(phase, offset, region)
            return ("node", phase, idx, tau)
        if region == "ODEParams":
            return ("raw", phase,
                    [offset + phase._opi(k) for k in range(phase.PV)], 0.0)
        if region == "StaticParams":
            return ("raw", phase,
                    [offset + phase._spi(k) for k in range(phase.SPV)], 0.0)
        raise ValueError(f"unsupported link region {region}")

    def _path_pack(self, phase, offset):
        """Per-node gather spec for a Path link region: row j gathers
        [node j vars, t0, tf, op, sp]; consts carry tau_j so the node
        time is reconstructed per application."""
        m = phase._m
        N = phase.numNodes
        cols = m + 2 + phase.PV + phase.SPV
        idx = np.empty((N, cols), np.int32)
        idx[:, :m] = offset + np.arange(N)[:, None] * m + np.arange(m)
        idx[:, m] = offset + phase._t0i
        idx[:, m + 1] = offset + phase._tfi
        for k in range(phase.PV):
            idx[:, m + 2 + k] = offset + phase._opi(k)
        for k in range(phase.SPV):
            idx[:, m + 2 + phase.PV + k] = offset + phase._spi(k)
        return idx, np.asarray(phase.taus)

    def _transcribe_path_link(self, nlp, func, sel, lp, kind):
        """Per-node link applications (reference LinkFlags::PathToPath,
        `OptimalControlProblem.cpp:675`): the phases' Path regions are
        zipped node-for-node into one multi-application family — every
        Path phase must discretize to the same node count.  Non-Path
        entries broadcast their boundary gather to every node.  The
        rows ride the normal banded/border routing of the block KKT."""
        trace = None
        if func is not None:
            trace, _, _ = _tracefun(func)
        packs = []
        idx_parts, tau_cols = [], []
        napps = None
        lo = 0
        for p, r, xtuv, opv, spv in sel:
            # rkind is the per-region gather decoding ("node"/"raw"); it is
            # deliberately distinct from the function-level `kind`
            # (eq/iq/objective routing) used at the bottom of this method.
            if r in ("Path", "InnerPath"):
                idx2d, taus = self._path_pack(
                    p, self._offsets_map[id(p)])
                if napps is None:
                    napps = idx2d.shape[0]
                elif idx2d.shape[0] != napps:
                    raise ValueError(
                        "PathToPath link requires equal node counts "
                        f"({idx2d.shape[0]} vs {napps})")
                rkind = "node"
            else:
                pack = self._region_pack(p, self._offsets_map[id(p)], r)
                idx2d = np.asarray(pack[2], np.int32)[None, :]
                taus = np.asarray([pack[3]])
                rkind = pack[0]         # "node" (Front/Back) or "raw"
            packs.append((p, lo, idx2d.shape[1],
                          np.asarray(xtuv), np.asarray(opv),
                          np.asarray(spv), rkind, r))
            idx_parts.append(idx2d)
            tau_cols.append(taus)
            lo += idx2d.shape[1]
        if napps is None:
            raise ValueError("path link needs at least one Path region")
        idx_parts = [np.broadcast_to(a, (napps, a.shape[1]))
                     for a in idx_parts]
        tau_cols = [np.broadcast_to(t, (napps,)) for t in tau_cols]
        lpn = len(lp)
        if lpn:
            lp_idx = np.broadcast_to(
                self._lp_offset + np.asarray(lp, np.int32)[None, :],
                (napps, lpn))
            idx_parts.append(lp_idx)
        Vidx = np.concatenate(idx_parts, axis=1)
        consts = np.stack(tau_cols, axis=1)              # (napps, nregions)

        def fun(g, c):
            parts = []
            for i, (p, lo_, ln, xtuv, opv, spv, rkind, r) in \
                    enumerate(packs):
                if rkind == "raw":
                    # ODEParams/StaticParams region: the gather IS the
                    # param vector — select with the matching index set
                    # (routing it through the node-layout decoder would
                    # silently misread, see _boundary_input)
                    seg = g[lo_:lo_ + ln]
                    sel_idx = opv if r == "ODEParams" else spv
                    parts.append(seg[sel_idx] if sel_idx.shape[0] else seg)
                    continue
                ps, _ = self._boundary_input(p, g, lo_, c[i])
                full = jnp.concatenate(ps)
                per = p.XV + 1 + p.UV
                if xtuv.shape[0]:
                    parts.append(full[xtuv])
                if opv.shape[0]:
                    parts.append(full[per + opv])
                if spv.shape[0]:
                    parts.append(full[per + p.PV + spv])
            if lpn:
                parts.append(g[Vidx.shape[1] - lpn:])
            return trace(jnp.concatenate(parts))

        fam = IndexedFunction(fun, np.asarray(Vidx, np.int32), consts,
                              name="pathlink",
                              in_scales=self._Uglob[Vidx])
        if kind == "objective":
            nlp.addObjective(fam)
        elif kind == "iq":
            nlp.addInequalCon(fam)
        else:
            nlp.addEqualCon(fam)

    def _transcribe_link(self, nlp, spec, offsets):
        kind = spec[0]
        self._offsets_map = {id(p): o
                             for p, o in zip(self.Phases, offsets)}
        if kind == "general_idx" and any(
                r in ("Path", "InnerPath") for _, r, *_ in spec[2]):
            _, func, sel, lp = spec
            return self._transcribe_path_link(nlp, func, sel, lp, "eq")
        if kind in ("general", "objective") and any(
                r in ("Path", "InnerPath") for _, r in spec[2]):
            _, func, pr = spec
            sel = [(p, r, np.arange(p.XV + 1 + p.UV),
                    np.arange(p.PV), np.arange(p.SPV)) for p, r in pr]
            return self._transcribe_path_link(
                nlp, func, sel, np.zeros(0, np.int32),
                "objective" if kind == "objective" else "eq")
        if kind == "direct" and (spec[3] in ("Path", "InnerPath")
                                 or spec[6] in ("Path", "InnerPath")):
            _, func, pa, ra, va, pb, rb, vb = spec
            if func is None:
                na = len(va)
                from ..VectorFunctions.function import Arguments
                A = Arguments(2 * na)
                func = A.head(na) - A.segment(na, na)
            sel = [(pa, ra, np.asarray(va), np.zeros(0, np.int32),
                    np.zeros(0, np.int32)),
                   (pb, rb, np.asarray(vb), np.zeros(0, np.int32),
                    np.zeros(0, np.int32))]
            return self._transcribe_path_link(
                nlp, func, sel, np.zeros(0, np.int32), "eq")
        if kind == "direct":
            _, func, pa, ra, va, pb, rb, vb = spec
            packa = self._region_pack(pa, offsets[self.Phases.index(pa)], ra)
            packb = self._region_pack(pb, offsets[self.Phases.index(pb)], rb)
            idx = packa[2] + packb[2]
            vaj = np.asarray(va)
            vbj = np.asarray(vb)
            la = len(packa[2])

            def build_inp(pack, g, lo):
                if pack[0] == "node":
                    parts, _ = self._boundary_input(pack[1], g, lo, pack[3])
                    return jnp.concatenate(parts)
                return g[lo:lo + len(pack[2])]

            if func is None:
                def fun(g, c):
                    ia = build_inp(packa, g, 0)
                    ib = build_inp(packb, g, la)
                    return ia[vaj] - ib[vbj]
                nout = len(va)
            else:
                trace, _, nout = _tracefun(func)
                def fun(g, c):
                    ia = build_inp(packa, g, 0)
                    ib = build_inp(packb, g, la)
                    return trace(jnp.concatenate([ia[vaj], ib[vbj]]))
            nlp.addEqualCon(IndexedFunction(
                fun, np.asarray([idx], np.int32), np.zeros((1, 1)),
                name="link",
                in_scales=self._Uglob[np.asarray([idx])]))
        elif kind == "general_idx":
            _, func, sel, lp = spec
            trace, ir, orr = _tracefun(func)
            idx = []
            packs = []
            for p, r, xtuv, opv, spv in sel:
                pack = self._region_pack(p, offsets[self.Phases.index(p)], r)
                packs.append((pack, len(idx), np.asarray(xtuv),
                              np.asarray(opv), np.asarray(spv), p))
                idx += pack[2]
            lp_lo = len(idx)
            idx += [self._lp_offset + int(k) for k in lp]
            lpn = len(lp)

            def fun(g, c):
                parts = []
                for pack, lo, xtuv, opv, spv, p in packs:
                    ps, _ = self._boundary_input(pack[1], g, lo, pack[3])
                    full = jnp.concatenate(ps)   # [x, t, u, op ++ sp]
                    per = p.XV + 1 + p.UV
                    if xtuv.shape[0]:
                        parts.append(full[xtuv])
                    if opv.shape[0]:
                        parts.append(full[per + opv])
                    if spv.shape[0]:
                        parts.append(full[per + p.PV + spv])
                if lpn:
                    parts.append(g[lp_lo:lp_lo + lpn])
                return trace(jnp.concatenate(parts))

            nlp.addEqualCon(IndexedFunction(
                fun, np.asarray([idx], np.int32), np.zeros((1, 1)),
                name="link",
                in_scales=self._Uglob[np.asarray([idx])]))
        elif kind in ("general", "objective"):
            _, func, pr = spec
            trace, ir, orr = _tracefun(func)
            idx = []
            packs = []
            lp_lo = None
            for p, r in pr:
                if r == "LinkParams":
                    lp_lo = len(idx)
                    idx += [self._lp_offset + k
                            for k in range(self._link_params.size)]
                    continue
                pack = self._region_pack(p, offsets[self.Phases.index(p)], r)
                packs.append((pack, len(idx)))
                idx += pack[2]

            def fun(g, c):
                parts = []
                for pack, lo in packs:
                    if pack[0] == "node":
                        ps, _ = self._boundary_input(pack[1], g, lo, pack[3])
                        parts.extend(ps)
                    else:
                        parts.append(g[lo:lo + len(pack[2])])
                if lp_lo is not None:
                    parts.append(g[lp_lo:])
                return trace(jnp.concatenate(parts))

            fam = IndexedFunction(fun, np.asarray([idx], np.int32),
                                  np.zeros((1, 1)), name="link",
                                  in_scales=self._Uglob[np.asarray([idx])])
            if kind == "objective":
                nlp.addObjective(fam)
            else:
                nlp.addEqualCon(fam)
        elif kind == "linkparams":
            _, func, pidx = spec
            trace, ir, orr = _tracefun(func)
            idx = [self._lp_offset + int(k) for k in pidx]
            fun = lambda g, c: trace(g)
            nlp.addEqualCon(IndexedFunction(
                fun, np.asarray([idx], np.int32), np.zeros((1, 1)),
                name="linkparam"))

    # --------------------------------------------------------------- solving
    def _make_input(self):
        return np.concatenate(
            [p.makeSolverInput() for p in self.Phases] + [self._link_params])

    def _collect(self, V):
        for p, o in zip(self.Phases, self._offsets):
            p.collectSolverOutput(V[o:o + p.numVars])
        if self._link_params.size:
            self._link_params = np.asarray(V[self._lp_offset:])

    def _call(self, method):
        self.transcribe()
        V0 = self._make_input()
        V = getattr(self.optimizer, method)(V0)
        self._collect(np.asarray(V))
        flag = self.optimizer.ConvergeFlag
        if not self.AdaptiveMesh:
            return flag
        # multi-phase adaptive mesh loop (reference ocp_call_impl,
        # `OptimalControlProblem.cpp:530-611`): estimate per-phase errors,
        # refine failing phases, re-transcribe the whole OCP, re-solve
        from .mesh import segment_errors, update_mesh, _combine
        max_iters = max(p.MaxMeshIters for p in self.Phases)
        for it in range(max_iters):
            all_ok = True
            for p in self.Phases:
                errs = segment_errors(p)
                err = _combine(errs, p.MeshErrorCriteria)
                p.MeshConverged = err < p.MeshTol
                if self.optimizer.PrintLevel <= 1:
                    print(f"  [mesh] phase {self.Phases.index(p)}: "
                          f"segs {p.numSegs} err {err:.3e} "
                          f"tol {p.MeshTol:.1e}")
                if not p.MeshConverged:
                    all_ok = False
                    n_new, bounds = update_mesh(p, errs)
                    p.resampleTraj(n_new, seg_bounds=bounds)
            if all_ok:
                return flag
            self.transcribe()
            V0 = self._make_input()
            V = getattr(self.optimizer, method)(V0)
            self._collect(np.asarray(V))
            flag = self.optimizer.ConvergeFlag
        return flag

    def optimize(self):
        return self._call("optimize")

    def solve(self):
        return self._call("solve")

    def solve_optimize(self):
        return self._call("solve_optimize")

    def solve_optimize_solve(self):
        return self._call("solve_optimize_solve")

    def optimize_solve(self):
        return self._call("optimize_solve")

    def jet_run(self):
        return self._call({"optimize": "optimize", "solve": "solve",
                           "solve_optimize": "solve_optimize"}.get(
                               self.JetJobMode, "optimize"))

    # ------------------------------------------------------------------ misc
    def setThreads(self, *a):
        pass

    def setAdaptiveMesh(self, flag=True, *a):
        self.AdaptiveMesh = bool(flag)
        for p in self.Phases:
            p.setAdaptiveMesh(flag)

    def setAutoScaling(self, flag=True, *a):
        for p in self.Phases:
            p.setAutoScaling(flag)

    def setMeshTol(self, tol):
        for p in self.Phases:
            p.setMeshTol(tol)

    def PrintMeshInfo(self, *a):
        pass

    def setJetJobMode(self, mode):
        self.JetJobMode = mode
