"""Host-chained VJP through the bounce loop.

jax.grad over the scan-based `trace` is the natural formulation, but this
environment's TPU runtime faults on multi-iteration scans of the bounce
body (CLAUDE.md).  This module differentiates the *host-looped* bounce
chain instead: the forward pass stores each bounce's input state (device
buffers), and the backward pass walks the chain in reverse with one small
jitted VJP step per bounce — the same two compiled programs serve every
bounce of every chunk, exactly like the forward renderer.

Mathematically identical to jax.grad(trace) (verified against it on CPU in
tests/test_hostgrad.py); memory is O(bounces) state copies per chunk,
the usual no-remat scan cost.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..diff import params as dp
from ..ops import integrator
from ..ops.camera import ray_with_dof
from ..scene.compile import CameraArrays, SceneArrays
from ..utils.vec import Vec2, Vec3


def _bounce_fn(params, rest: SceneArrays, state, key, bounce_idx,
               direct_light_mode, hits=None, want_hits=False,
               tex_channels=(True, True, True)):
    return integrator.bounce_step(
        dp.merge(params, rest), state, key, bounce_idx,
        direct_light_mode=direct_light_mode,
        hits=hits, want_hits=want_hits,
        tex_channels=tex_channels,
    )


class HostGrad:
    """Reusable jitted forward/backward bounce steps for a fixed scene
    topology (rest) and config."""

    def __init__(self, rest: SceneArrays, cam: CameraArrays,
                 direct_light_mode: str = "reference", lens_shape: str = "circle",
                 tex_channels: tuple[bool, bool, bool] = (True, True, True),
                 span: int = 1):
        """`span`: bounces processed per jitted forward/backward call.
        The host chain is dispatch-latency-bound on this environment's
        TPU relay (docs/perf.md round-3 anatomy: bwd wall time is a
        constant ~30-40 ms from 1M to 8M rays — pure per-dispatch
        overhead), so spanning k bounces per program divides the
        latency-dominated chain length by k.  num_bounces must be a
        multiple of span.  Memory: the VJP holds residuals for `span`
        unrolled bounces at once (~span x the 1-bounce footprint);
        span=3 at 2^23 rays fits a 16 GB chip."""
        self.rest = rest
        self.cam = cam
        self.span = span

        # the scene tables (`rest`) are jit *arguments*, not closure
        # captures: captured arrays embed as HLO constants, which stalls
        # this environment's remote TPU compile service (CLAUDE.md)
        @jax.jit
        def fwd(params, rest, state, key, b0):
            # one program advances `span` bounces, recording each bounce's
            # packed hit decisions — free byproducts of walks it does anyway
            hits = []
            for j in range(span):
                state, h = _bounce_fn(params, rest, state, key, b0 + j,
                                      direct_light_mode, want_hits=True,
                                      tex_channels=tex_channels)
                hits.append(h)
            return state, tuple(hits)

        @jax.jit
        def bwd(params, rest, state, key, b0, hits, cot_state, grads_in):
            # replay the recorded hits: the VJP program contains no BVH
            # walk at all (the hit search is detached — see
            # ops/intersect.py intersect_scene — so gradients are
            # identical to re-searching).  The span's parameter cotangent
            # is accumulated into `grads_in` INSIDE the program: every
            # folded-away dispatch is relay latency off the critical path.
            def span_fn(p, st):
                for j in range(span):
                    step = lambda p, st, j=j: _bounce_fn(
                        p, rest, st, key, b0 + j,
                        direct_light_mode, hits=hits[j],
                        tex_channels=tex_channels)
                    if span > 1:
                        # per-bounce rematerialization: the transpose of k
                        # unrolled bounces as ONE fused program sends
                        # XLA:CPU compiles into the weeds (docs/perf.md);
                        # checkpointing each bounce keeps the bwd program a
                        # chain of k 1-bounce VJPs (recompute-from-input),
                        # the same shape XLA already compiles well at
                        # span=1, while still folding k dispatches into
                        # one relay round-trip
                        step = jax.checkpoint(step)
                    st = step(p, st)
                return st

            cot_params, cot_state = jax.vjp(span_fn, params, state)[1](cot_state)
            if grads_in is None:
                return cot_params, cot_state
            return jax.tree.map(jnp.add, grads_in, cot_params), cot_state

        def raygen_body(nc: Vec2, key):
            n = nc.x.shape[0]
            k_lens, _ = jax.random.split(key)
            k1, k2 = jax.random.split(k_lens)
            u1 = jax.random.uniform(k1, (n,), nc.x.dtype)
            u2 = jax.random.uniform(k2, (n,), nc.x.dtype)
            o, d = ray_with_dof(cam, nc, u1, u2, lens_shape)
            return integrator.init_path_state(o, d)

        raygen = jax.jit(raygen_body)

        @jax.jit
        def add(a, b):
            return jax.tree.map(jnp.add, a, b)

        self._fwd, self._bwd, self._raygen, self._add = fwd, bwd, raygen, add
        self._raygen_body = raygen_body
        self._direct_light_mode = direct_light_mode
        self._tex_channels = tex_channels
        self._lens_shape = lens_shape
        # jitted loss->cotangent programs, keyed (weakly) by the loss
        # callable: a fresh jit closure per value_and_grad call would be a
        # fresh jit cache entry, i.e. a full (remote, 15-25 s) recompile
        # per call.  Callers must pass a STABLE callable across calls to
        # hit this cache; the weak keying releases abandoned closures and
        # their compiled programs instead of retaining them forever.
        import weakref

        self._loss_cot = weakref.WeakKeyDictionary()
        # fused single-dispatch fwd+loss+bwd programs (value_and_grad_fused),
        # same weak keying per loss callable
        self._fused = weakref.WeakKeyDictionary()

    def radiance(self, params, nc: Vec2, key, num_bounces: int) -> Vec3:
        assert num_bounces % self.span == 0, (num_bounces, self.span)
        state = self._raygen(nc, key)
        _, k_path = jax.random.split(key)
        for b0 in range(0, num_bounces, self.span):
            state, _ = self._fwd(params, self.rest, state, k_path, b0)
        return state.acc

    def value_and_grad(self, params, nc: Vec2, key, num_bounces: int, loss_on_acc):
        """loss_on_acc: jittable (acc Vec3) -> scalar.  Returns
        (loss, dloss/dparams) with the backward chained on the host."""
        # forward, retaining each span's input state + packed hit records
        assert num_bounces % self.span == 0, (num_bounces, self.span)
        state = self._raygen(nc, key)
        _, k_path = jax.random.split(key)
        states = []
        hit_recs = []
        for b0 in range(0, num_bounces, self.span):
            states.append(state)
            state, rec = self._fwd(params, self.rest, state, k_path, b0)
            hit_recs.append(rec)

        # seed the cotangent from the loss on the final accumulator
        loss_and_cot = self._loss_cot.get(loss_on_acc)
        if loss_and_cot is None:

            @jax.jit
            def loss_and_cot(final_state):
                loss, vjp_fn = jax.vjp(
                    lambda st: loss_on_acc(st.acc), final_state
                )
                (cot_state,) = vjp_fn(jnp.ones((), loss.dtype))
                return loss, cot_state

            self._loss_cot[loss_on_acc] = loss_and_cot

        loss, cot_state = loss_and_cot(state)

        grads = None
        span_starts = list(range(0, num_bounces, self.span))
        for si in reversed(range(len(span_starts))):
            grads, cot_state = self._bwd(
                params, self.rest, states[si], k_path, span_starts[si],
                hit_recs[si], cot_state, grads,
            )
        return loss, grads

    def value_and_grad_fused(self, params, nc: Vec2, key, num_bounces: int,
                             loss_on_acc):
        """Single-dispatch fwd+loss+bwd: the whole chain — ray generation,
        the `num_bounces` forward walk, the loss, its cotangent, and the
        hit-replay VJP back to the parameters — as ONE jitted program.

        Requires span == num_bounces (one span covers the path).  On the
        serializing TPU relay this removes every inter-program round-trip
        the host-chained variant pays (measured round 5, docs/perf.md:
        span=9 chained = 4 dispatches/pass at 9.2e8 rays/s; fused = 1
        dispatch), at the price of one compile of a fwd+bwd-sized program.
        Gradients are identical to the chained path (the VJP replays the
        forward's packed hit records exactly like `_bwd`; verified in
        tests/test_hostgrad.py).  TPU-path lever: the k-bounce transpose
        is a pathologically slow *compile* on XLA:CPU (docs/perf.md), so
        CPU flows keep the chained span=1 path."""
        assert num_bounces == self.span, (num_bounces, self.span)
        span = self.span
        fused = self._fused.get(loss_on_acc)
        if fused is None:
            direct_light_mode = self._direct_light_mode
            tex_channels = self._tex_channels
            raygen_body = self._raygen_body

            @jax.jit
            def fused(params, rest, nc, key):
                state0 = raygen_body(nc, key)
                _, k_path = jax.random.split(key)
                # live forward records the packed hit decisions
                st, hits = state0, []
                for j in range(span):
                    st, h = _bounce_fn(params, rest, st, k_path, j,
                                       direct_light_mode, want_hits=True,
                                       tex_channels=tex_channels)
                    hits.append(h)
                loss, loss_vjp = jax.vjp(lambda s: loss_on_acc(s.acc), st)
                (cot_state,) = loss_vjp(jnp.ones((), loss.dtype))

                def span_fn(p, s):
                    for j in range(span):
                        step = lambda p, s, j=j: _bounce_fn(
                            p, rest, s, k_path, j, direct_light_mode,
                            hits=hits[j], tex_channels=tex_channels)
                        if span > 1:
                            # per-bounce remat, same rationale as _bwd
                            step = jax.checkpoint(step)
                        s = step(p, s)
                    return s

                cot_params, _ = jax.vjp(span_fn, params, state0)[1](cot_state)
                return loss, cot_params

            self._fused[loss_on_acc] = fused
        return fused(params, self.rest, nc, key)
