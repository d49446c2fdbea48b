"""Persistent TPU job worker.

Device attach through the axon tunnel can take minutes; paying it once per
experiment would burn the whole round. This worker holds ONE process with
the TPU attached and executes Python job files dropped into /tmp/tpu_jobs:

    /tmp/tpu_jobs/<name>.py      -> executed (shared globals persist)
    /tmp/tpu_jobs/<name>.out     -> stdout+stderr+traceback of the job
    /tmp/tpu_jobs/<name>.done    -> written when the job finishes

Jobs run sequentially in submission (mtime, name) order. The shared
globals dict persists across jobs, so a job can stash arrays/programs for
later jobs. Write STOP to /tmp/tpu_jobs/stop to exit.
"""

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

t0 = time.time()
import jax  # noqa: E402
from gpirt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # env var alone is read too early; see utils/cache.py


devs = jax.devices()
print(f"[worker] attached in {time.time() - t0:.1f}s: {devs}", flush=True)
with open(os.path.join(JOBS, "ready"), "w") as fh:
    fh.write(f"{time.time() - t0:.1f}s {devs}\n")

G = {"__name__": "__tpu_job__"}

while True:
    if os.path.exists(os.path.join(JOBS, "stop")):
        print("[worker] stop requested", flush=True)
        break
    jobs = sorted(
        f for f in os.listdir(JOBS)
        if f.endswith(".py") and not os.path.exists(
            os.path.join(JOBS, f[:-3] + ".done"))
    )
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    out_path = os.path.join(JOBS, name[:-3] + ".out")
    print(f"[worker] running {name}", flush=True)
    buf = io.StringIO()
    old_out, old_err = sys.stdout, sys.stderr

    class Tee:
        def __init__(self, *streams):
            self.streams = streams

        def write(self, s):
            for st in self.streams:
                st.write(s)

        def flush(self):
            for st in self.streams:
                st.flush()

    sys.stdout = sys.stderr = Tee(buf, old_out)
    t_job = time.time()
    try:
        with open(path) as fh:
            code = fh.read()
        exec(compile(code, path, "exec"), G)
        status = "ok"
    except BaseException:
        traceback.print_exc()
        status = "error"
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    wall = time.time() - t_job
    with open(out_path, "w") as fh:
        fh.write(buf.getvalue())
        fh.write(f"\n[worker] job {name}: {status} in {wall:.1f}s\n")
    with open(os.path.join(JOBS, name[:-3] + ".done"), "w") as fh:
        fh.write(status)
    print(f"[worker] {name}: {status} in {wall:.1f}s", flush=True)
