import subprocess, sys, json, statistics, time, os

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

B = start("/tmp/base_cc5e14d", "/tmp/abB.log"); wait_ready(B, "base")
H = start("/root/repo", "/tmp/abH.log"); wait_ready(H, "head")

sys.path.insert(0, "/root/repo")
import bench as benchmod
names = list(benchmod.BENCH_QUERIES) + ["index_build_lineitem"]
WARMS, REPS = 2, 7
EXTRA = {"ext_minhash_dedup": (3, 9), "index_build_lineitem": (4, 7)}
out = {}
for name in names:
    w, r = EXTRA.get(name, (WARMS, REPS))
    for i in range(w):
        rep(B, "W", name); rep(H, "W", name)
    bs, hs = [], []
    for i in range(r):
        # alternate which side goes first within the pair to cancel
        # even sub-rep drift
        if i % 2 == 0:
            bs.append(rep(B, "T", name)); hs.append(rep(H, "T", name))
        else:
            hs.append(rep(H, "T", name)); bs.append(rep(B, "T", name))
    mb, mh = statistics.median(bs), statistics.median(hs)
    pair_deltas = sorted((h - b) / b for b, h in zip(bs, hs))
    med_pair = pair_deltas[len(pair_deltas)//2]
    out[name] = {"base": [round(x,4) for x in bs], "head": [round(x,4) for x in hs],
                 "med_base": round(mb,4), "med_head": round(mh,4),
                 "med_pair_delta_pct": round(100*med_pair,1)}
    print(f"{name:32s} B {mb:7.3f}  H {mh:7.3f}  med-paired {100*med_pair:+6.1f}%", flush=True)
for p in (B, H):
    try:
        p.stdin.write("Q\n"); p.stdin.flush()
    except Exception:
        pass
json.dump(out, open("/tmp/ab_interleaved.json", "w"), indent=1)
print("DONE", flush=True)
