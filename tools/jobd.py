"""Persistent TPU experiment daemon: watches /tmp/tpujobs for NNN.py files,
execs each in-process (shared globals -> compiled kernels stay cached), writes
NNN.out (stdout+traceback). Iteration tool only -- not part of the package."""
import faulthandler
import io
import os
import signal
import sys
import time
import traceback
import contextlib

faulthandler.register(signal.SIGUSR1, all_threads=True)

JOBS = "/tmp/tpujobs"
os.makedirs(JOBS, exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G = {"__name__": "__tpujob__"}

print("jobd ready", flush=True)
while True:
    jobs = sorted(
        f for f in os.listdir(JOBS)
        if f.endswith(".py") and not os.path.exists(os.path.join(JOBS, f + ".done"))
    )
    for f in jobs:
        path = os.path.join(JOBS, f)
        buf = io.StringIO()
        try:
            src = open(path).read()
            with contextlib.redirect_stdout(buf):
                exec(compile(src, path, "exec"), G)
            status = "OK"
        except BaseException:
            buf.write(traceback.format_exc())
            status = "FAIL"
        with open(path + ".out", "w") as fh:
            fh.write(buf.getvalue())
            fh.write(f"\n== {status}\n")
        open(path + ".done", "w").close()
        print(f"{f}: {status}", flush=True)
    time.sleep(0.5)
