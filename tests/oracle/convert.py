"""Convert oracle harness binary dumps to .npz fixtures."""

from __future__ import annotations

import struct
import sys

import numpy as np

_DTYPES = {"d": np.float64, "i": np.int32, "B": np.uint8, "q": np.int64}


def read_dump(path: str) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (name_len,) = struct.unpack("<I", head)
            name = f.read(name_len).decode()
            dtype = _DTYPES[f.read(1).decode()]
            (ndim,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{ndim}q", f.read(8 * ndim))
            total = int(np.prod(dims)) if ndim else 1
            data = np.frombuffer(
                f.read(total * np.dtype(dtype).itemsize), dtype=dtype
            )
            out[name] = data.reshape(dims)
    return out


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    arrays = read_dump(src)
    # The decoded input pixels are integral u8 values stored as f64 by the
    # reference Image; store them as uint8 (8x smaller fixtures).  Consumers
    # cast back to float — values are identical.
    if "input" in arrays:
        inp = arrays["input"]
        if np.array_equal(inp, np.round(inp)) and inp.min() >= 0 and inp.max() <= 255:
            arrays["input"] = inp.astype(np.uint8)
    np.savez_compressed(dst, **arrays)
    print(f"{dst}: {len(arrays)} arrays")
    for k, v in list(arrays.items())[:12]:
        print(" ", k, v.shape, v.dtype)
