#!/usr/bin/env python3
"""Golden .npz/.npy test assets for graft.io.Npy, written by NumPy
itself so the Scala reader is pinned to the real producer, not to a
round-trip through its own assumptions. Values are exact
binary-representable formulas asserted independently in NpyGoldenSpec.
"""
import io
import numpy as np
from pathlib import Path

out = Path(__file__).resolve().parent.parent / "src/test/resources"

emb = (np.arange(15, dtype=np.float32).reshape(5, 3) * np.float32(0.25)
       - np.float32(1.5))
f8_fortran = np.asfortranarray(
    np.arange(12, dtype=np.float64).reshape(3, 4) * 0.125 - 1.0)
i8_vec = (np.arange(7, dtype=np.int64) ** 3) - 50
i4_mat = (np.arange(6, dtype=np.int32).reshape(2, 3) * 1000) - 2500
u1_vec = ((np.arange(9) * 37) % 256).astype(np.uint8)
b1_vec = (np.arange(5) % 2).astype(np.bool_)

np.savez_compressed(out / "npy_golden.npz", embeddings=emb,
                    f8_fortran=f8_fortran, i8_vec=i8_vec, i4_mat=i4_mat,
                    u1_vec=u1_vec, b1_vec=b1_vec)

# a v2.0-header .npy (readers must handle the uint32 header length)
buf = io.BytesIO()
np.lib.format.write_array(buf, emb, version=(2, 0))
(out / "npy_v2_golden.npy").write_bytes(buf.getvalue())

print("wrote", out / "npy_golden.npz", "and npy_v2_golden.npy")
