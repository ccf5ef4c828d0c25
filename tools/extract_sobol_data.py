"""Extract the Sobol'/(0,2)/maxmindist generator-matrix DATA tables into
.npy files under pbrt_tpu/samplers/data/.

These are the standard pbrt-v3 numeric tables (Joe & Kuo direction numbers
and Groenbeck C-matrices — mathematical constants, not code), parsed out of
the reference's generated sobol_matrices.rs / low_discrepency.rs so the
sampler can reproduce the reference's sample sequences bit-for-bit
(BASELINE matched-sequence requirement). Run once; outputs are committed.
"""
import os
import re

import numpy as np

REF = "/root/reference/core/src"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "pbrt_tpu", "samplers", "data")


def parse_int_block(text, start_marker, end_marker):
    """All integer literals (hex or decimal) between the markers, with //
    comments stripped (the tables mix 0x literals and bare 0 padding)."""
    s = text.index("=", text.index(start_marker))   # skip the type decl
    e = text.index(end_marker, s) if end_marker is not None else len(text)
    block = re.sub(r"//[^\n]*", "", text[s:e])
    toks = re.findall(r"\b(?:0x[0-9a-fA-F]+|\d+)\b", block)
    return [int(x, 0) for x in toks]


def main():
    os.makedirs(OUT, exist_ok=True)
    sm = open(os.path.join(REF, "sobol_matrices.rs")).read()

    m32 = parse_int_block(sm, "SOBOL_MATRICES_32: [u32", "SOBOL_MATRICES_64")
    assert len(m32) == 1024 * 52, len(m32)
    np.save(os.path.join(OUT, "sobol_matrices_32.npy"),
            np.asarray(m32, np.uint32).reshape(1024, 52))

    vdc = parse_int_block(sm, "VD_C_SOBOL_MATRICES: [[u64", "VD_C_SOBOL_MATRICES_INV")
    assert len(vdc) == 25 * 52, len(vdc)
    np.save(os.path.join(OUT, "vdc_sobol_matrices.npy"),
            np.asarray(vdc, np.uint64).reshape(25, 52))

    vdci = parse_int_block(sm, "VD_C_SOBOL_MATRICES_INV: [[u64", None)
    vdci = vdci[:26 * 52]
    assert len(vdci) == 26 * 52, len(vdci)
    np.save(os.path.join(OUT, "vdc_sobol_matrices_inv.npy"),
            np.asarray(vdci, np.uint64).reshape(26, 52))

    ld = open(os.path.join(REF, "low_discrepency.rs")).read()
    # 17 inner arrays of 32 u32 (skip the 3 ints in the type declaration)
    cmm = parse_int_block(ld, "C_MAX_MIN_DIST: [[u32", "];")[:17 * 32]
    assert len(cmm) == 17 * 32, len(cmm)
    np.save(os.path.join(OUT, "c_max_min_dist.npy"),
            np.asarray(cmm, np.uint32).reshape(17, 32))
    print("wrote", os.listdir(OUT))


if __name__ == "__main__":
    main()
