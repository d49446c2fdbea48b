"""One-time conversion of the bundled datasets into in-repo .npz files.

The reference package ships data/senate116.rda and data/SDO.rda inside the
package (reference DESCRIPTION:22, R/senate116.R:3-14). This script reads
those .rda files with our pure-Python RData reader and writes equivalent
.npz archives under /root/repo/data so the framework is standalone: the
test suite, bench, and examples must not depend on the reference mount.

Run from the repo root:  python scripts/vendor_datasets.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpirt_tpu.utils.rdata import load_rda, R_NA_INT

REF_DATA = "/root/reference/data"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def vendor_senate116() -> None:
    obj = load_rda(os.path.join(REF_DATA, "senate116.rda"))["senate116"]
    df = obj.to_python()
    out = os.path.join(OUT, "senate116.npz")
    np.savez_compressed(
        out,
        rollnumber=np.asarray(df["rollnumber"], np.int64),
        icpsr=np.asarray(df["icpsr"], np.int64),
        cast_code=np.asarray(df["cast_code"], np.int64),
    )
    print(f"wrote {out}: {np.asarray(df['rollnumber']).size} rows")


def vendor_sdo() -> None:
    df = load_rda(os.path.join(REF_DATA, "SDO.rda"))["SDO"].to_python()
    cols, names = [], []
    for name, v in df.items():
        arr = np.asarray(v, dtype=np.float64)
        arr = np.where(arr == float(R_NA_INT), np.nan, arr)
        cols.append(arr)
        names.append(str(name))
    mat = np.column_stack(cols)
    out = os.path.join(OUT, "SDO.npz")
    np.savez_compressed(out, responses=mat, item_names=np.asarray(names))
    print(f"wrote {out}: shape {mat.shape}, items {names[:3]}...")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    vendor_senate116()
    vendor_sdo()
