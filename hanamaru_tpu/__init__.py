"""hanamaru_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
gam0022/hanamaru-renderer (a Rust CPU path tracer): 5 BSDFs, analytic
spheres/cuboids + triangle meshes with BVH acceleration, 3 texture
channels, thin-lens DoF, cube-map IBL, NEE, progressive time-budgeted
rendering, Reinhard tonemap, bilateral denoise, 4 debug render modes —
redesigned data-oriented and wavefront-style for TPU, differentiable
end-to-end, and sharded over device meshes for multi-chip scaling.

Package map (see SURVEY.md §7 for the design rationale):
- `config`   — render configuration (reference config.rs + CLI tiers)
- `utils`    — vec math, colors, OBJ loading
- `scene`    — host-side scene compiler: descriptions -> SoA device tables
- `models`   — the reference scene set as data (registry)
- `ops`      — device compute: camera, intersection/BVH, BSDFs, textures,
               integrator, post-processing
- `parallel` — mesh sharding / multi-host
- `runtime`  — progressive renderer, CLI, snapshots, logging
- `diff`     — gradient wrappers and inverse rendering
"""

__version__ = "0.1.0"
