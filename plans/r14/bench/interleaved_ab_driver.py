"""r14 rep-interleaved base-vs-head paired harness (same instrument as
plans/r13/bench/ — two warm coprocesses, one per tree, alternating single
timed reps within ~1s so both arms share each ambient draw; this host's
sequential pairs were proven weather-bound in r13).

Usage: python interleaved_ab_driver.py <out.json> [workload ...]
  (no workloads -> full bench set + index_build_lineitem)
Requires the base tree checked out at /tmp/r14_base (git worktree of the
round-start commit) and plans/r13/bench/interleaved_ab_coproc.py copied
to /tmp/coproc.py.
"""
import subprocess, sys, json, statistics, os

OUT = sys.argv[1]
ONLY = sys.argv[2:]

def start(root, log):
    p = subprocess.Popen([sys.executable, "/tmp/coproc.py", root],
                         stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                         stderr=open(log, "w"), text=True, bufsize=1,
                         env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
                              "SPARK_GRAFT_CPUS": "32"})
    return p

def wait_ready(p, tag):
    for line in p.stdout:
        if line.strip() == "READY":
            print(f"{tag} ready", flush=True)
            return
    raise RuntimeError(f"{tag} died")

def rep(p, cmd, name):
    p.stdin.write(f"{cmd} {name}\n"); p.stdin.flush()
    for line in p.stdout:
        line = line.strip()
        if line == "WARM":
            return None
        if line.startswith("TIME"):
            return float(line.split()[1])
    raise RuntimeError(f"coproc died on {name}")

# head first (r13 session 2 showed reversing startup order cancels the
# older-JVM asymmetry; alternate per run if pooling)
H = start("/root/repo", "/tmp/abH.log")
B = start("/tmp/r14_base", "/tmp/abB.log")
wait_ready(H, "head"); wait_ready(B, "base")

sys.path.insert(0, "/root/repo")
import bench as benchmod
names = ONLY or (list(benchmod.BENCH_QUERIES) + ["index_build_lineitem"])
WARMS, REPS = 2, 7
EXTRA = {"ext_minhash_dedup": (3, 9), "index_build_lineitem": (4, 7)}
out = {}
for name in names:
    w, r = EXTRA.get(name, (WARMS, REPS))
    for i in range(w):
        rep(B, "W", name); rep(H, "W", name)
    bs, hs = [], []
    loads = []
    for i in range(r):
        if i % 2 == 0:
            bs.append(rep(B, "T", name)); hs.append(rep(H, "T", name))
        else:
            hs.append(rep(H, "T", name)); bs.append(rep(B, "T", name))
        loads.append(round(os.getloadavg()[0], 2))
    mb, mh = statistics.median(bs), statistics.median(hs)
    pair_deltas = sorted((h - b) / b for b, h in zip(bs, hs))
    med_pair = pair_deltas[len(pair_deltas)//2]
    out[name] = {"base": [round(x,4) for x in bs], "head": [round(x,4) for x in hs],
                 "load": loads,
                 "med_base": round(mb,4), "med_head": round(mh,4),
                 "neg_pairs": sum(1 for d in pair_deltas if d < 0),
                 "med_pair_delta_pct": round(100*med_pair,1)}
    print(f"{name:32s} B {mb:7.3f}  H {mh:7.3f}  med-paired {100*med_pair:+6.1f}%  ({out[name]['neg_pairs']}/{r} neg)", flush=True)
for p in (B, H):
    try:
        p.stdin.write("Q\n"); p.stdin.flush()
    except Exception:
        pass
json.dump(out, open(OUT, "w"), indent=1)
print("wrote", OUT, flush=True)
