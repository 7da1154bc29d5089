"""Grid serialization (npz) — debugging reproducibility + warm starts.

The reference has no checkpointing (grids are rebuilt per frame); this is
the aux subsystem from SURVEY.md §5: serialize the built SoA arrays so a
grid can be reloaded without paying the build (useful for debug replays and
cross-process benchmarks).
"""

from __future__ import annotations

import json

import numpy as np

from ..core.types import Triangles
from ..grid.irregular import IrregularGrid
from ..grid.packet import PacketGrid
from ..grid.uniform import UniformGrid

_PACKET_FIELDS = ("bbox_lo", "bbox_hi", "rs", "rowinfo", "cols",
                  "total_refs", "total_pairs", "planes")


def save_grid(path: str, grid) -> None:
    import jax

    arrays = {}
    meta = {}
    if isinstance(grid, PacketGrid):
        meta["kind"] = "packet"
        meta["dims3"] = [list(d) for d in grid.dims3]
        fields = _PACKET_FIELDS
    elif isinstance(grid, IrregularGrid):
        meta["kind"] = "irregular"
        meta["top_dims"] = grid.top_dims
        meta["levels"] = grid.levels
        fields = ("bbox_lo", "bbox_hi", "top_res_log", "top_offset",
                  "entries", "cell_min", "cell_max", "cell_starts",
                  "ref_ids", "alive", "num_entries", "total_refs",
                  "preexpanded", "top_info", "erec", "ref_tris")
    else:
        meta["kind"] = "uniform"
        meta["dims"] = grid.dims
        fields = ("bbox_lo", "bbox_hi", "cell_starts", "ref_ids",
                  "total_refs")
    for name in fields:
        arrays[name] = np.asarray(jax.device_get(getattr(grid, name)))
    for name in ("v0", "e1", "e2", "n"):
        arrays["tri_" + name] = np.asarray(jax.device_get(
            getattr(grid.tris, name)))
    # Meta is JSON, never repr/eval: loading a checkpoint must not be able
    # to execute code from the file.
    np.savez_compressed(path, __meta__=np.asarray([json.dumps(meta)]),
                        **arrays)


def load_grid(path: str):
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"][0]))
    tris = Triangles(v0=jnp.asarray(z["tri_v0"]),
                     e1=jnp.asarray(z["tri_e1"]),
                     e2=jnp.asarray(z["tri_e2"]),
                     n=jnp.asarray(z["tri_n"]))
    a = {k: jnp.asarray(v) for k, v in z.items()
         if not k.startswith(("tri_", "__"))}
    if meta["kind"] == "packet":
        return PacketGrid(dims3=tuple(tuple(d) for d in meta["dims3"]),
                          tris=tris, **a)
    if meta["kind"] == "irregular":
        return IrregularGrid(top_dims=tuple(meta["top_dims"]),
                             levels=int(meta["levels"]), tris=tris, **a)
    return UniformGrid(dims=tuple(meta["dims"]), tris=tris, **a)
