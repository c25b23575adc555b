"""Generate NF4 golden tensors with REAL bitsandbytes (run where bnb+CUDA
exist; this environment has neither — SURVEY §7 hard-part #1 requires golden
parity vs bnb's actual dequant, so the fixture must come from bnb itself).

Usage (on a CUDA machine with bitsandbytes installed):

    python tests/fixtures/make_nf4_golden.py

writes ``nf4_golden.npz`` next to this script with, per test tensor:
  x           fp32 input
  packed      uint8 bnb-packed 4-bit codes (two per byte, high nibble first)
  absmax      fp32 per-64-block absmax (dequantized when double-quant)
  dq_absmax   int8 double-quant absmax codes + dq_scale/dq_offset
  dequant     fp32 bitsandbytes dequantize_4bit output

``tests/test_ops.py::test_nf4_matches_bnb_golden`` consumes the file and
asserts bit-exact agreement of cullavo_tpu.ops.nf4 dequantization; it SKIPS
(with this command printed) while the fixture is absent.
"""
import os

import numpy as np


def main():
    import torch
    import bitsandbytes.functional as F

    rng = np.random.default_rng(0)
    out = {}
    for name, shape in [("a", (64,)), ("b", (4096,)), ("c", (128, 256))]:
        x = rng.normal(size=shape).astype(np.float32)
        t = torch.tensor(x, device="cuda")
        for dq, tag in [(False, ""), (True, "_dq")]:
            packed, state = F.quantize_4bit(t, blocksize=64, quant_type="nf4",
                                            compress_statistics=dq)
            deq = F.dequantize_4bit(packed, state, quant_type="nf4")
            out[f"{name}{tag}_x"] = x
            out[f"{name}{tag}_packed"] = packed.cpu().numpy().reshape(-1)
            # absmax as STORED (int8 codes when compress_statistics) and
            # as DEQUANTIZED fp32 (what the 4-bit dequant actually scales by)
            out[f"{name}{tag}_absmax_stored"] = state.absmax.cpu().numpy()
            if dq and state.state2 is not None:
                fp_absmax = F.dequantize_blockwise(state.absmax,
                                                   state.state2) + state.offset
                out[f"{name}{tag}_absmax_fp"] = fp_absmax.cpu().numpy()
                out[f"{name}{tag}_dq_scale"] = state.state2.absmax.cpu().numpy()
                out[f"{name}{tag}_dq_offset"] = np.float32(state.offset.item())
            else:
                out[f"{name}{tag}_absmax_fp"] = state.absmax.cpu().float().numpy()
            out[f"{name}{tag}_dequant"] = deq.cpu().float().numpy().reshape(shape)
    path = os.path.join(os.path.dirname(__file__), "nf4_golden.npz")
    np.savez(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
