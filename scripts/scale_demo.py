#!/usr/bin/env python
"""Order-of-magnitude scale demo (VERDICT r5 task 4): >=1e8 bp build with
--disk-swap under a stated RAM cap, >=1e5 labels, row_diff_brwt
conversion, device-path query (dense gate overflows -> block-sparse
annotation), and alignment — throughput + peak RSS per stage.

Input model: 200 "species" x 500 samples = 100,000 labels.  Each species
has a 100 kb backbone and a 2 kb marker gene; each 1 kb sample read takes
a 600 bp backbone slice + 200 bp of the shared marker (-> genuinely dense
annotation rows: ~500 labels, few distinct patterns — the core-genome
shape) + 200 bp private sequence.  Total 1e8 bp; ~6e7 distinct k-mers.

Stages run through the real CLI in subprocesses; wall time and peak RSS
are recorded per stage into scale_demo_report.json (SCALING.md copies the
table).  Scale via env: SCALE_SPECIES, SCALE_SAMPLES (per species),
SCALE_OUT (workdir).
"""

import json
import os
import re
import resource
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SPECIES = int(os.environ.get("SCALE_SPECIES", 200))
N_SAMPLES = int(os.environ.get("SCALE_SAMPLES", 500))
OUT = os.environ.get("SCALE_OUT", "/tmp/scale_demo")
K = 20
READ_LEN = 1000
BACKBONE = 100_000
MARKER = 2_000
RAM_CAP_GB = 4.0

os.makedirs(OUT, exist_ok=True)
REPORT = os.path.join(OUT, "scale_demo_report.json")
report = json.load(open(REPORT)) if os.path.exists(REPORT) else {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_stage(name, argv, force=False):
    """Run a CLI stage in a subprocess under /usr/bin/time -v; record wall
    seconds + peak RSS.  Stages are resumable (skipped when recorded)."""
    if name in report and not force:
        log(f"[skip] {name}: {report[name]}")
        return
    log(f"[stage] {name}: {' '.join(argv)}")
    t0 = time.time()
    # keep the axon sitecustomize on PYTHONPATH (it registers the TPU
    # relay backend) and prepend the repo
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # no /usr/bin/time in this image: sample the child's VmHWM ourselves
    r = subprocess.Popen(argv, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
    peak_kb = 0
    while r.poll() is None:
        try:
            with open(f"/proc/{r.pid}/status") as f:
                m = re.search(r"VmHWM:\s+(\d+) kB", f.read())
                if m:
                    peak_kb = max(peak_kb, int(m.group(1)))
        except OSError:
            pass
        time.sleep(0.5)
    out, err = r.communicate()
    r = subprocess.CompletedProcess(argv, r.returncode, out, err)
    wall = time.time() - t0
    rss_gb = peak_kb / 1e6 if peak_kb else None
    if r.returncode != 0:
        log(r.stderr[-3000:])
        raise SystemExit(f"stage {name} failed rc={r.returncode}")
    report[name] = {"wall_s": round(wall, 1), "peak_rss_gb":
                    round(rss_gb, 2) if rss_gb else None}
    json.dump(report, open(REPORT, "w"), indent=1)
    log(f"[done] {name}: {report[name]}")
    return r


def stage_generate():
    if "generate" in report:
        return
    t0 = time.time()
    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = os.path.join(OUT, "input.fa")
    reads_fa = os.path.join(OUT, "reads.fa")
    total = 0
    with open(fa, "wb") as f:
        for sp in range(N_SPECIES):
            bb = alpha[rng.integers(0, 4, BACKBONE)]
            mk = alpha[rng.integers(0, 4, MARKER)]
            starts = rng.integers(0, BACKBONE - 600, N_SAMPLES)
            priv = alpha[rng.integers(0, 4, (N_SAMPLES, 200))]
            for i in range(N_SAMPLES):
                # every sample of a species carries the same conserved
                # 200 bp marker slice -> the marker's annotation rows share
                # ONE label pattern per species (the dense-pattern-dedup
                # shape of real core genes; random per-sample marker
                # windows would make ~2k distinct ~50-dense patterns per
                # species = a 36 GB side matrix)
                seq = np.concatenate([bb[starts[i]: starts[i] + 600],
                                      mk[: 200],
                                      priv[i]])
                f.write(b">sp%04d_s%04d\n" % (sp, i))
                f.write(seq.tobytes() + b"\n")
                total += len(seq)
    # query/align read sets: mutated slices of the input
    rng2 = np.random.default_rng(11)
    lines = []
    recs = open(fa, "rb").read().split(b">")[1:2002:2]
    for i, rec in enumerate(recs[:1000]):
        seq = np.frombuffer(
            rec.split(b"\n", 1)[1].replace(b"\n", b""), np.uint8).copy()
        mut = rng2.random(len(seq)) < 0.02
        seq[mut] = alpha[rng2.integers(0, 4, int(mut.sum()))]
        lines.append(b">read%04d\n" % i + seq.tobytes() + b"\n")
    open(reads_fa, "wb").write(b"".join(lines))
    open(os.path.join(OUT, "reads_head.fa"), "wb").write(
        b"".join(lines[:40]))
    open(os.path.join(OUT, "reads_align.fa"), "wb").write(
        b"".join(x.split(b"\n")[0] + b"\n" + x.split(b"\n")[1][:150]
                 + b"\n" for x in lines[:200]))
    report["generate"] = {"wall_s": round(time.time() - t0, 1),
                          "total_bp": total}
    json.dump(report, open(REPORT, "w"), indent=1)
    log(f"[done] generate: {report['generate']}")


def main():
    py = sys.executable
    cli = [py, "-m", "metagraph_tpu.cli"]
    fa = os.path.join(OUT, "input.fa")
    reads = os.path.join(OUT, "reads.fa")
    gbase = os.path.join(OUT, "graph")
    swap = os.path.join(OUT, "swap")
    os.makedirs(swap, exist_ok=True)

    stage_generate()
    run_stage("build_disk_swap", cli + [
        "build", "-k", str(K), "--disk-swap", swap, "--mem-cap-gb",
        str(RAM_CAP_GB), "-o", gbase, fa])
    run_stage("annotate", cli + [
        "annotate", "-i", gbase + ".dbg.npz", "--anno-header",
        "-o", os.path.join(OUT, "anno"), fa])
    run_stage("transform_row_diff_brwt", cli + [
        "transform_anno", "-i", gbase + ".dbg.npz", "--anno-type",
        "row_diff_brwt", "--max-path-length", "20",
        "-o", os.path.join(OUT, "anno_rdb"),
        os.path.join(OUT, "anno.column.annodbg.npz")])
    import glob
    rdb = glob.glob(os.path.join(OUT, "anno_rdb.*.annodbg"))
    log(f"row_diff_brwt artifacts: {rdb}")
    anno_art = rdb[0]
    # prebuild the device working structure by column streaming (the
    # scalable conversion; per-row conversion from the loaded compressed
    # matrix measures ~1k rows/s host-side at this scale)
    run_stage("devsparse_convert", cli + [
        "transform_anno", "--anno-type", "devsparse",
        "-o", anno_art + ".devsparse.npz",
        os.path.join(OUT, "anno.column.annodbg.npz")])
    r = run_stage("query_device", cli + [
        "query", "-i", gbase + ".dbg.npz", "-a", anno_art, "--device",
        reads])
    if r is not None:
        open(os.path.join(OUT, "query_device.out"), "w").write(r.stdout)
    r = run_stage("query_host_spotcheck", cli + [
        "query", "-i", gbase + ".dbg.npz", "-a", anno_art,
        os.path.join(OUT, "reads_head.fa")])
    if r is not None:
        open(os.path.join(OUT, "query_host.out"), "w").write(r.stdout)
    if os.path.exists(os.path.join(OUT, "query_device.out")):
        dev_out = open(os.path.join(OUT, "query_device.out")).read()
        host_out = open(os.path.join(OUT, "query_host.out")).read()
        same = dev_out.splitlines()[:40] == host_out.splitlines()[:40]
        report["device_vs_host_first40_identical"] = bool(same)
        json.dump(report, open(REPORT, "w"), indent=1)
        log(f"device vs host (first 40 reads) identical: {same}")
    run_stage("align", cli + [
        "align", "-i", gbase + ".dbg.npz",
        os.path.join(OUT, "reads_align.fa")])
    log(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
