"""Generate docs/api.md from the public surface's docstrings.

The reference ships a generated per-function reference (man/*.Rd for every
export, e.g. /root/reference/man/gpirtMCMC.Rd). This is the analog: one
page listing every ``__all__`` symbol of the public modules with its
signature and full docstring, regenerated from source so it cannot drift.

Run:  JAX_PLATFORMS=cpu python scripts/gen_api_docs.py
"""

import importlib
import inspect
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (module, blurb) in reading order — the user-facing surface first, then the
# layers underneath.
MODULES = [
    ("gpirt_tpu.api",
     "The reference-parity user surface (R/gpirtMCMC.R, R/recover_fstar.R)."),
    ("gpirt_tpu.campaigns",
     "Campaign-replicated estimation: R independent SMC campaigns with "
     "honest (replication-paid) uncertainty (no reference analog)."),
    ("gpirt_tpu.utils.response",
     "Response ingestion: recoding, unanimity filtering "
     "(R/response_matrix.R)."),
    ("gpirt_tpu.utils.datasets",
     "Bundled datasets (senate116, SDO) and synthetic generators."),
    ("gpirt_tpu.utils.diagnostics",
     "Convergence diagnostics: R-hat, ESS, basin clustering (beyond the "
     "reference, which stores only an ll trace)."),
    ("gpirt_tpu.utils.checkpoint",
     "Atomic checkpoint / bitwise resume (no reference analog)."),
    ("gpirt_tpu.utils.irf",
     "Item response function utilities."),
    ("gpirt_tpu.utils.rdata",
     "Minimal .rda/.RData reader (no R installation needed)."),
    ("gpirt_tpu.utils.profiling",
     "On-device block profiling."),
    ("gpirt_tpu.parallel.chains",
     "Multi-chain parallelism over a device mesh."),
    ("gpirt_tpu.parallel.items",
     "Item-axis model parallelism (the reference's OpenMP-over-items "
     "fan-out, mapped to the mesh)."),
    ("gpirt_tpu.parallel.respondents",
     "Respondent-axis model parallelism (the dual OpenMP fan-out)."),
    ("gpirt_tpu.parallel.smc",
     "SMC annealed initialization (basin-correct ensemble placement)."),
    ("gpirt_tpu.parallel.tempering",
     "Parallel tempering ensembles."),
    ("gpirt_tpu.parallel.distributed",
     "Multi-process / multi-host execution."),
    ("gpirt_tpu.models.config",
     "Model configuration and precomputed GP constants."),
    ("gpirt_tpu.models.sampler",
     "The single-chain Gibbs driver (src/gpirtMCMC.cpp's loop)."),
    ("gpirt_tpu.models.gibbs",
     "The five Gibbs blocks and sweep (src/draw-*.cpp)."),
    ("gpirt_tpu.models.generate",
     "Generative-model sampling (Geweke tests, simulation studies)."),
    ("gpirt_tpu.ops.kernels",
     "Covariance kernels (src/covariance-function.cpp semantics)."),
    ("gpirt_tpu.ops.likelihood",
     "Ordinal-probit likelihood (src/log-likelihood.cpp semantics)."),
    ("gpirt_tpu.ops.linalg",
     "Batched Cholesky / triangular-solve helpers."),
    ("gpirt_tpu.ops.ess",
     "The generic elliptical-slice-sampling primitive."),
]


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return ""


def _doc(obj):
    d = inspect.getdoc(obj)
    return d if d else "*(no docstring)*"


def emit(fh):
    fh.write("# gpirt_tpu API reference\n\n")
    fh.write(
        "Generated from source docstrings by `scripts/gen_api_docs.py` — "
        "do not edit by hand.\nEvery public (`__all__`) symbol of every "
        "public module, in reading order: the\nuser surface first, then "
        "parallel execution, then the model/ops layers.\nThe reference "
        "package's analog is its generated `man/*.Rd` pages.\n\n")
    # table of contents
    fh.write("## Contents\n\n")
    for mod_name, blurb in MODULES:
        anchor = mod_name.replace(".", "")
        fh.write(f"- [`{mod_name}`](#{anchor}) — {blurb}\n")
    fh.write("\n")

    for mod_name, blurb in MODULES:
        mod = importlib.import_module(mod_name)
        names = getattr(mod, "__all__", [])
        fh.write(f"\n## {mod_name}\n\n{blurb}\n\n")
        mdoc = inspect.getdoc(mod)
        if mdoc:
            first = mdoc.split("\n\n")[0]
            fh.write(f"> {first}\n\n".replace("\n", "\n> ")
                     .replace("> \n", ">\n"))
        for name in names:
            obj = getattr(mod, name)
            kind = ("class" if inspect.isclass(obj)
                    else "function" if callable(obj) else "constant")
            sig = _signature(obj) if kind != "constant" else ""
            fh.write(f"\n### `{mod_name.rsplit('.', 1)[-1]}.{name}`\n\n")
            if kind == "constant":
                fh.write(f"Constant: `{name} = {obj!r}`\n")
                continue
            fh.write(f"```python\n{name}{sig}\n```\n\n")
            fh.write(_doc(obj))
            fh.write("\n")
            if inspect.isclass(obj):
                for mname, meth in sorted(vars(obj).items()):
                    if mname.startswith("_") and mname != "__init__":
                        continue
                    if not callable(meth):
                        continue
                    msig = _signature(meth)
                    fh.write(f"\n**`.{mname}{msig}`**\n\n")
                    fh.write(_doc(meth))
                    fh.write("\n")


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "api.md")
    with open(out, "w") as fh:
        emit(fh)
    n = sum(len(getattr(importlib.import_module(m), "__all__", []))
            for m, _ in MODULES)
    print(f"wrote {out}: {len(MODULES)} modules, {n} symbols")


if __name__ == "__main__":
    main()
