"""AOT-serialized serving artifacts (jax.export).

Production deployment of the mesh-serving decode without Python tracing:
`export_decode_program` serializes the three-level sparse decode (one
latent -> compact near-surface payload) as a portable StableHLO artifact
plus a JSON header of the geometry parameters the host consumer needs
(res, b2, caps). A server loads it with `load_decode_program` and calls
it on raw latent vectors — no model code, decoder params are baked into
the artifact as constants.

The artifact is a zip with two entries:
  meta.json  — {"latent_size", "res", "b2", "cap1", "cap2", "cap3",
                "safety", "safety3", "out_dtype", "platforms"}
  program.bin — jax.export serialization (versioned, forward-compatible
                per jax's export compatibility guarantees)

`platforms` defaults to the current backend; pass
platforms=("tpu",) to cross-compile a TPU artifact from a CPU host.
"""

from __future__ import annotations

import io
import json
import pathlib
import zipfile
from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np


def export_decode_program(apply_fn, latent_size: int, res: int,
                          caps: tuple, safety: float = 1.2,
                          safety3: float = 2.0,
                          out_dtype: str = "int8",
                          platforms: Optional[Sequence[str]] = None,
                          path: Optional[str] = None) -> bytes:
    """Serialize the sparse serving decode for one-latent requests.

    Exported signature: z [latent_size] f32 ->
      (c1 [nb1^3], c2 [cap1, (b1/b2)^3], idx1 [cap1],
       vals2 [cap2, b2^3], ids2 [cap2], n1, n2, n3)
    — the compact v2 payload serve.serve_meshes ships (minus its
    dynamic row bucketing, which an AOT program cannot do: the payload
    is cap-sized). out_dtype="int8" (default) is the sign-preserving
    quantized payload; the dequantization scale is stored in meta.
    Decoder parameters reachable from `apply_fn` are captured as
    constants inside the artifact.
    """
    import jax.numpy as jnp
    from jax import export as jexport

    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        _decode_grid_hier3_impl, hier3_int8_scale)

    cap1, cap2, cap3 = caps

    @jax.jit
    def run(z):
        (c1, c2, i1, v2, i2), n1, n2, n3 = _decode_grid_hier3_impl(
            apply_fn, z, res, 16, 4, 2, cap1, cap2, cap3,
            safety=safety, safety3=safety3, layout="sparse2",
            out_dtype=out_dtype)
        return c1, c2, i1, v2, i2, n1, n2, n3

    z_spec = jax.ShapeDtypeStruct((latent_size,), jnp.float32)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exp = jexport.export(run, **kw)(z_spec)
    meta = {"latent_size": latent_size, "res": res, "b1": 16, "b2": 4,
            "cap1": cap1, "cap2": cap2, "cap3": cap3,
            "safety": safety, "safety3": safety3,
            "out_dtype": out_dtype, "payload": "sparse2",
            "quant_scale": (hier3_int8_scale(res, 4, safety)
                            if out_dtype in ("int8", "int4") else None),
            "platforms": list(exp.platforms)}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=2))
        zf.writestr("program.bin", exp.serialize())
    blob = buf.getvalue()
    if path is not None:
        pathlib.Path(path).write_bytes(blob)
    return blob


class CapacityExceeded(RuntimeError):
    """A latent's surface shell overflowed the artifact's static caps."""


class DecodeArtifact:
    """Loaded serving artifact: callable latent -> (grid | payload)."""

    def __init__(self, meta: dict, fn):
        self.meta = meta
        self._fn = fn

    def payload(self, z) -> tuple:
        """z [latent_size] -> (c1, c2, idx1, vals2, ids2, n1, n2, n3)."""
        import jax.numpy as jnp
        return self._fn(jnp.asarray(z, jnp.float32))

    def grid(self, z, check_capacity: bool = True) -> np.ndarray:
        """Full x-major [res]^3 host grid via sparse reconstruction.

        Raises CapacityExceeded when the latent's surface shell
        overflows the capacities baked into the artifact: the AOT
        program has static caps and CANNOT escalate like
        serve.serve_meshes — a silently clamped payload would mean
        silently missing geometry. Re-export with larger caps for such
        shapes (or pass check_capacity=False to accept truncation).
        """
        from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
            sparse2_to_grid)
        c1, c2, i1, v2, i2, n1, n2 = self._payload_checked(
            z, check_capacity)
        m = self.meta
        return sparse2_to_grid(c1, c2, i1, v2, i2, n1, n2,
                               m["res"], m["b1"], m["b2"],
                               dequant_scale=m.get("quant_scale"))

    def _payload_checked(self, z, check_capacity: bool) -> tuple:
        c1, c2, i1, v2, i2, n1, n2, n3 = self.payload(z)
        n1, n2, n3 = int(n1), int(n2), int(n3)
        m = self.meta
        if check_capacity and (n1 > m["cap1"] or n2 > m["cap2"]
                               or n3 > m["cap3"]):
            raise CapacityExceeded(
                f"surface shell overflows exported caps: active "
                f"l1/l2/l3 = {n1}/{n2}/{n3} vs caps {m['cap1']}/"
                f"{m['cap2']}/{m['cap3']}; the AOT artifact cannot "
                f"escalate — re-export with larger caps")
        return (c1, c2, i1, v2, i2, min(n1, m["cap1"]),
                min(n2, m["cap2"]))

    def mesh(self, z, iso: float = 0.0,
             check_capacity: bool = True) -> tuple:
        """z -> (verts, faces) through marching cubes (payload-direct
        at iso=0 when the native lib is built — serve.py's host fast
        path; dense reconstruction otherwise). Raises CapacityExceeded
        on surface-shell overflow (see grid())."""
        m = self.meta
        if (m.get("b1"), m["b2"]) != (16, 4):  # non-default export
            from latent_diffusion_models_for_shape_sdfs_tpu.ops \
                .isosurface import extract_mesh
            return extract_mesh(
                self.grid(z, check_capacity=check_capacity), iso=iso)
        from latent_diffusion_models_for_shape_sdfs_tpu.serve import (
            _mesh_v2_payload)
        c1, c2, i1, v2, i2, n1, n2 = self._payload_checked(
            z, check_capacity)
        verts, faces, _mesher = _mesh_v2_payload(
            c1, c2, i1, v2, i2, n1, n2, m["res"], iso,
            m.get("quant_scale"))
        return verts, faces


def export_sampler_program(denoise_fn, schedule, num: int,
                           latent_size: int, steps: int = 50,
                           sampler: str = "ddim",
                           mu=None, sigma=None,
                           platforms: Optional[Sequence[str]] = None,
                           path: Optional[str] = None) -> bytes:
    """Serialize the latent sampler as a portable StableHLO artifact.

    Exported signature: z_T [num, latent_size] f32 (caller-provided
    standard normal) -> z_0 [num, latent_size] f32 in DECODER latent
    space (the stage-2 normalization moments mu/sigma are baked in when
    given) — pairs directly with the decode artifact for a
    no-model-code noise -> latents -> meshes serving stack. Denoiser
    params reachable from `denoise_fn` (incl. any CFG/conditioning
    closure from diffusion.sampler.guided_denoise_fn) are captured as
    constants. `sampler`: "ddim" (steps as given, eta=0) or "dpm"
    (DPM-Solver++(2M), pair with steps~10). Deterministic: the output
    depends only on z_T.
    """
    import jax.numpy as jnp
    from jax import export as jexport

    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler \
        import ddim_sample, dpm_solver_sample

    sample_fn = {"ddim": ddim_sample, "dpm": dpm_solver_sample}[sampler]
    mu_c = None if mu is None else jnp.asarray(mu, jnp.float32)
    sigma_c = None if sigma is None else jnp.asarray(sigma, jnp.float32)

    @jax.jit
    def run(z_T):
        z = sample_fn(denoise_fn, schedule, jax.random.PRNGKey(0),
                      num, latent_size, steps=steps, z_init=z_T)
        if mu_c is not None:
            z = z * sigma_c + mu_c
        return z

    spec = jax.ShapeDtypeStruct((num, latent_size), jnp.float32)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exp = jexport.export(run, **kw)(spec)
    meta = {"kind": "sampler", "num": num, "latent_size": latent_size,
            "steps": steps, "sampler": sampler,
            "timesteps": int(schedule.timesteps),
            "unnormalized": mu is not None,
            "platforms": list(exp.platforms)}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=2))
        zf.writestr("program.bin", exp.serialize())
    blob = buf.getvalue()
    if path is not None:
        pathlib.Path(path).write_bytes(blob)
    return blob


class SamplerArtifact:
    """Loaded sampler artifact: z_T [num, L] -> z_0 [num, L]."""

    def __init__(self, meta: dict, fn):
        self.meta = meta
        self._fn = fn

    def sample(self, z_T) -> np.ndarray:
        import jax.numpy as jnp
        z_T = jnp.asarray(z_T, jnp.float32)
        if z_T.shape != (self.meta["num"], self.meta["latent_size"]):
            raise ValueError(
                f"z_T shape {z_T.shape} != exported "
                f"({self.meta['num']}, {self.meta['latent_size']})")
        return np.asarray(self._fn(z_T))

    def sample_seed(self, seed: int) -> np.ndarray:
        """Convenience: draw z_T from a host numpy Generator."""
        rng = np.random.default_rng(seed)
        z_T = rng.standard_normal(
            (self.meta["num"], self.meta["latent_size"])).astype(
                np.float32)
        return self.sample(z_T)


def load_sampler_program(blob_or_path) -> SamplerArtifact:
    from jax import export as jexport

    if isinstance(blob_or_path, (str, pathlib.Path)):
        blob = pathlib.Path(blob_or_path).read_bytes()
    else:
        blob = blob_or_path
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        meta = json.loads(zf.read("meta.json"))
        exp = jexport.deserialize(zf.read("program.bin"))
    return SamplerArtifact(meta, jax.jit(exp.call))


def load_decode_program(blob_or_path) -> DecodeArtifact:
    from jax import export as jexport

    if isinstance(blob_or_path, (str, pathlib.Path)):
        blob = pathlib.Path(blob_or_path).read_bytes()
    else:
        blob = blob_or_path
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        meta = json.loads(zf.read("meta.json"))
        exp = jexport.deserialize(zf.read("program.bin"))
    return DecodeArtifact(meta, jax.jit(exp.call))
