import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cProfile, pstats, io
import runpy
# reuse the probe setup by importing it up to the lower() call
src = open(os.path.join(os.path.dirname(__file__), "_ms_trace_probe.py")).read()
src = src.split("t0 = time.perf_counter(); lowered")[0]
exec(compile(src, "_setup", "exec"), globals())

pr = cProfile.Profile()
pr.enable()
lowered = jf.lower(*args, **kwargs)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(40)
print(s.getvalue()[:7000])
