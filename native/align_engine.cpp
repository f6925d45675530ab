// Native flat multi-extension alignment engine.
//
// Full C++ implementation of the flat engine's wave loop
// (metagraph_tpu/align/flat.py FlatEngine): best-first pop discipline,
// banded column DP, x-drop / extension-cutoff bookkeeping, convergence
// filter, and backtrack-candidate collection — bit-identical to the
// sequential DefaultColumnExtender (ref aligner_extender_methods.cpp:412-700).
// Graph traversal and backtracking stay in Python: each step() is
//   eng_step_pop      -> parents that need outgoing-edge enumeration
//   (Python batch graph traversal)
//   eng_step_children -> score + book-keep every child, exact per-sibling
// Jobs are independent, so per-job sequential child processing IS the
// reference algorithm; the engine exists to remove the per-wave Python
// and numpy dispatch overhead around it.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <queue>
#include <tuple>
#include <unordered_map>
#include <vector>

namespace {

using std::int32_t;
using std::int64_t;
using std::uint8_t;

typedef std::tuple<int64_t, int64_t, int64_t> Entry;  // (-score, offd, -tidx)

struct Cand {
    int64_t tidx, score, offd, pos;
    uint8_t tipf;
};

struct Job {
    // scalars (flat.py add_job)
    int64_t WS = 0, wsize = 0, seed_off = 0, seed_off0 = 0, seed_len = 0;
    int64_t seed_node0 = 0;
    bool ffs = false;
    int64_t pso = 0, xdrop = 0, msc = 0, reb = 0, sdist = 0;
    double cap = 0.0, rcut = 0.0;
    int64_t cutoff = 0, best = 0, TL = 1, mcs = 0;
    bool done = false;
    // seed arrays
    std::vector<int64_t> seed_nodes;
    std::vector<uint8_t> seed_seq;
    // per-job profile (C x W int32), partial sums (W), window bytes (W)
    std::vector<int32_t> P, pss;
    std::vector<uint8_t> winb;
    // best-first pop state (flat.py _Job)
    std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> queue;
    std::vector<Entry> next_nodes;       // equal-priority batch, served LIFO
    std::vector<int64_t> gcols;          // tidx -> store row
    std::vector<int64_t> col_max;
    std::unordered_map<int64_t, int64_t> conv_rows;
    std::vector<Cand> cand;
    std::vector<int64_t> tips;
    int64_t cur = -1;                    // popped tidx this wave
};

struct Engine {
    int64_t W = 0, C = 0, k = 0, go = 0, ge = 0, NINF = 0;
    std::vector<int64_t> char_idx;       // 256 -> profile row
    // columnar store (rows of width W)
    std::vector<int32_t> gS, gE, gF;
    std::vector<int64_t> g_node, g_parent, g_c, g_off, g_maxpos, g_score;
    int64_t g_n = 0;
    std::vector<int64_t> free_rows;
    // convergence-filter store (rows of width W-1)
    std::vector<int32_t> CONV;
    int64_t conv_n = 0;
    std::vector<int64_t> active;
    std::vector<Job> jobs;
    // pending traversal parents from the last eng_step_pop
    std::vector<int64_t> pend_jobs;
    // scratch
    std::vector<int32_t> sS, sE, sF;

    int64_t galloc() {
        if (!free_rows.empty()) {
            int64_t r = free_rows.back();
            free_rows.pop_back();
            return r;
        }
        int64_t r = g_n++;
        if ((int64_t)g_node.size() < g_n) {
            int64_t cap = g_node.size() ? (int64_t)g_node.size() * 2 : 4096;
            gS.resize(cap * W);
            gE.resize(cap * W);
            gF.resize(cap * W);
            g_node.resize(cap);
            g_parent.resize(cap);
            g_c.resize(cap);
            g_off.resize(cap);
            g_maxpos.resize(cap);
            g_score.resize(cap);
        }
        return r;
    }
    int64_t conv_alloc() {
        int64_t r = conv_n++;
        int64_t w = W > 1 ? W - 1 : 1;
        if ((int64_t)CONV.size() < conv_n * w)
            CONV.resize(std::max<int64_t>(conv_n * w * 2, 4096 * w));
        return r;
    }
};

const int64_t POS = 2147483647;

// pop discipline (flat.py _Job.pop_next): serve the current equal-priority
// batch LIFO; refill it from the heap, grabbing every entry whose first
// element (-score) matches.
int64_t pop_next(Job &job) {
    if (job.next_nodes.empty()) {
        if (job.queue.empty())
            return -1;
        Entry item = job.queue.top();
        job.queue.pop();
        job.next_nodes.push_back(item);
        while (!job.queue.empty() &&
               std::get<0>(job.queue.top()) == std::get<0>(item)) {
            job.next_nodes.push_back(job.queue.top());
            job.queue.pop();
        }
    }
    Entry e = job.next_nodes.back();
    job.next_nodes.pop_back();
    return -std::get<2>(e);
}

void push_child(Job &job, int64_t converged_score, int64_t off_diag,
                int64_t tidx) {
    Entry entry(-converged_score, off_diag, -tidx);
    if (!job.next_nodes.empty() &&
        -converged_score == std::get<0>(job.next_nodes.front()))
        job.next_nodes.push_back(entry);
    else
        job.queue.push(entry);
}

// pop-time node-cap kill and cutoff skip (flat.py _pop_parent)
int64_t pop_parent(Job &job) {
    const int64_t cutoff = job.cutoff, best = job.best;
    const double wsize = (double)std::max<int64_t>(job.wsize, 1);
    const double cap = job.cap;
    while (true) {
        int64_t tidx = pop_next(job);
        if (tidx < 0)
            return -1;
        int64_t cmax = job.col_max[tidx];
        if (cmax < best && (double)job.gcols.size() / wsize >= cap) {
            job.queue = {};
            job.next_nodes.clear();
            return -1;
        }
        if (cmax >= cutoff)
            return tidx;
    }
}

// Score + book-keep ONE child column, exactly per the sibling-sequential
// reference semantics (flat.py _wave multi branch / extender.py:269-331).
// hull (lo/hi) is fixed at pop time; cutoff/best are read live.
void process_child(Engine &E, Job &job, int64_t j_id, int64_t ptidx,
                   int64_t lo, int64_t hi, int64_t node, int64_t chr,
                   int64_t ns) {
    const int64_t W = E.W, go = E.go, ge = E.ge, ninf = E.NINF;
    const int64_t prow = job.gcols[ptidx];
    const int32_t *Sp = E.gS.data() + prow * W;
    const int32_t *Fpr = E.gF.data() + prow * W;
    const int64_t poff = E.g_off[prow];
    const int64_t off = poff + 1;
    const int64_t spos = off - job.seed_off0;
    const bool in_seed = spos >= 0 && spos < job.seed_len;
    const bool hd = off > 1;
    const int64_t cut = job.cutoff;
    const int64_t diag = off - job.seed_off;
    const double ext_cut = (double)job.best * job.rcut + (double)job.pso;
    const int32_t *prof = job.P.data() + E.char_idx[chr & 255] * W;
    const int32_t *ps = job.pss.data();
    const int64_t wlim = job.WS < W ? job.WS : W;
    const int64_t mlo = lo - 1 > 0 ? lo - 1 : 0, mhi = hi - 1;
    (void)j_id;

    int32_t *Sc = E.sS.data();
    int32_t *Ec = E.sE.data();
    int32_t *Fc = E.sF.data();
    int64_t run = std::numeric_limits<int64_t>::min();
    int64_t best = ninf, cmin = POS;
    bool hx = false;
    for (int64_t j = 0; j < W; ++j) {
        int64_t M;
        if (j >= 1) {
            const int64_t spm = (j - 1 >= mlo && j - 1 <= mhi)
                ? Sp[j - 1] : ninf;
            M = (spm == ninf) ? ninf : spm + prof[j] + ns;
        } else {
            M = ninf;
        }
        int64_t Fv = ninf;
        if (hd) {
            const bool inb = (j >= lo && j <= hi);
            const int64_t spf = inb ? Sp[j] : ninf;
            const int64_t fp = inb ? Fpr[j] : ninf;
            const int64_t dop = (spf == ninf) ? ninf : spf + go;
            const int64_t dex = (fp == ninf) ? ninf : fp + ge;
            Fv = dop > dex ? dop : dex;
            Fv = (Fv == ninf) ? ninf : Fv + ns;
        }
        if (Fv > M) M = Fv;
        int64_t Ev = ninf;
        if (j >= 1) {
            const int64_t idxge = j * ge;
            Ev = (run <= ninf - idxge) ? ninf : run + idxge;
        }
        const int64_t B = M + go - (j + 1) * ge;
        if (B > run) run = B;
        int64_t Sv = M > Ev ? M : Ev;
        if (Sv < cut) Sv = ninf;
        if (!((j >= lo && j <= hi) || Sv != ninf)) Ev = ninf;
        if (j >= wlim) { Sv = ninf; Ev = ninf; Fv = ninf; }
        Sc[j] = (int32_t)Sv;
        Ec[j] = (int32_t)Ev;
        Fc[j] = (int32_t)Fv;
        if (Sv > best) best = Sv;
        if (Sv != ninf && Sv < cmin) cmin = Sv;
        if (!hx && (double)(Sv + (int64_t)ps[j]) >= ext_cut) hx = true;
    }
    // max position: first index minimizing |j - diag| among S == best
    int64_t mp = 0, bdist = POS + 1;
    for (int64_t j = 0; j < W; ++j) {
        if (Sc[j] != (int32_t)best) continue;
        const int64_t d = (j >= wlim) ? POS : (j > diag ? j - diag : diag - j);
        if (d < bdist) { bdist = d; mp = j; }
    }

    // min cell score tracks every computed child, kept or not
    if (cmin != POS && cmin < job.mcs)
        job.mcs = cmin;

    const bool keep = in_seed || (best >= cut && hx);
    if (!keep)
        return;

    const int64_t tidx = job.TL++;
    const int64_t g = E.galloc();
    std::memcpy(E.gS.data() + g * W, Sc, W * sizeof(int32_t));
    std::memcpy(E.gE.data() + g * W, Ec, W * sizeof(int32_t));
    std::memcpy(E.gF.data() + g * W, Fc, W * sizeof(int32_t));
    E.g_node[g] = node;
    E.g_parent[g] = ptidx;
    E.g_c[g] = chr;
    E.g_off[g] = off;
    E.g_maxpos[g] = mp;
    E.g_score[g] = ns;
    job.gcols.push_back(g);
    job.col_max.push_back(best);
    if (best - job.xdrop > job.cutoff)
        job.cutoff = best - job.xdrop;
    if (best > job.best)
        job.best = best;

    // backtrack candidates (flat.py _collect_candidates /
    // extender.py:445-478)
    if (off >= job.sdist) {
        const int64_t kws = job.wsize;
        const int64_t s_sp = best;
        const int64_t s_lp = Sc[kws];
        const int64_t p_mp = Sp[mp - 1 > 0 ? mp - 1 : 0];
        const int64_t p_lp = Sp[kws - 1 > 0 ? kws - 1 : 0];
        const int64_t sc_mp = prof[mp];
        const int64_t winc_mp = job.winb[mp - 1 > 0 ? mp - 1 : 0];
        const int64_t reb = job.reb, msc = job.msc;
        if (mp >= 1 && s_sp != ninf && p_mp != ninf) {
            const int64_t bonus = (mp == kws) ? reb : 0;
            if (s_sp + bonus >= msc) {
                const bool is_m = (s_sp == p_mp + ns + sc_mp)
                    && winc_mp == chr;
                const int64_t od = mp > diag ? mp - diag : diag - mp;
                job.cand.push_back({tidx, s_sp + bonus, od, mp,
                                    (uint8_t)(!(is_m || mp == kws))});
            }
        }
        if (mp != kws && kws >= 1 && s_lp != ninf && p_lp != ninf
            && s_lp + reb >= msc) {
            const int64_t od = kws > diag ? kws - diag : diag - kws;
            job.cand.push_back({tidx, s_lp + reb, od, kws, 0});
        }
    }

    // convergence filter + queue push (flat.py _conv_flush)
    if (job.wsize == 0)
        return;
    const int64_t cw = W > 1 ? W - 1 : 1;
    const int32_t *scores = Sc + 1;      // width W-1
    int64_t ret = ninf;
    if (node == 0) {                     // dummy node: no filter row
        int64_t m = ninf;
        for (int64_t t = 0; t < cw; ++t)
            if (scores[t] > m) m = scores[t];
        ret = m;
    } else {
        auto it = job.conv_rows.find(node);
        if (it == job.conv_rows.end()) {
            const int64_t r = E.conv_alloc();
            job.conv_rows.emplace(node, r);
            int32_t *seg = E.CONV.data() + r * cw;
            int64_t m = ninf;
            for (int64_t t = 0; t < cw; ++t) {
                seg[t] = scores[t];
                if (scores[t] > m) m = scores[t];
            }
            ret = m;
        } else {
            int32_t *seg = E.CONV.data() + it->second * cw;
            const double rc = job.rcut;
            int64_t chg = ninf;
            bool any = false;
            for (int64_t t = 0; t < cw; ++t) {
                const int64_t sc = scores[t];
                if ((double)sc > (double)seg[t] * rc) {
                    const int64_t upd = sc > seg[t] ? sc : seg[t];
                    seg[t] = (int32_t)upd;
                    if (upd > chg) chg = upd;
                    any = true;
                }
            }
            ret = any ? chg : ninf;
        }
    }
    const int64_t mdiff = mp > diag ? mp - diag : diag - mp;
    if (ret != ninf)
        push_child(job, ret, mdiff, tidx);
}

}  // namespace

extern "C" {

void *aeng_create(int64_t W, int64_t C, int64_t k, int64_t go, int64_t ge,
                  int64_t ninf, const int64_t *char_idx) {
    Engine *E = new Engine();
    E->W = W;
    E->C = C;
    E->k = k;
    E->go = go;
    E->ge = ge;
    E->NINF = ninf;
    E->char_idx.assign(char_idx, char_idx + 256);
    E->sS.resize(W);
    E->sE.resize(W);
    E->sF.resize(W);
    return E;
}

void aeng_destroy(void *h) { delete (Engine *)h; }

// Admit one extension job; root column arrays are W-wide (NINF padded).
int64_t aeng_add_job(
    void *h, int64_t WS, int64_t wsize, int64_t seed_off, int64_t seed_off0,
    int64_t seed_len, int64_t seed_node0, int64_t ffs, int64_t pso,
    double cap, int64_t xdrop, double rcut, int64_t cut0, int64_t msc,
    int64_t reb, int64_t sdist,
    const int64_t *seed_nodes, int64_t n_nodes,
    const uint8_t *seed_seq, int64_t n_seq,
    const int32_t *P, const int32_t *pss, const uint8_t *winb,
    const int32_t *rS, const int32_t *rE, const int32_t *rF,
    int64_t root_node, int64_t root_colmax) {
    Engine &E = *(Engine *)h;
    const int64_t W = E.W;
    E.jobs.emplace_back();
    Job &job = E.jobs.back();
    const int64_t j = (int64_t)E.jobs.size() - 1;
    job.WS = WS;
    job.wsize = wsize;
    job.seed_off = seed_off;
    job.seed_off0 = seed_off0;
    job.seed_len = seed_len;
    job.seed_node0 = seed_node0;
    job.ffs = ffs != 0;
    job.pso = pso;
    job.cap = cap;
    job.xdrop = xdrop;
    job.rcut = rcut;
    job.cutoff = cut0;
    job.msc = msc;
    job.reb = reb;
    job.sdist = sdist;
    job.seed_nodes.assign(seed_nodes, seed_nodes + n_nodes);
    job.seed_seq.assign(seed_seq, seed_seq + n_seq);
    job.P.assign(P, P + E.C * W);
    job.pss.assign(pss, pss + W);
    job.winb.assign(winb, winb + W);
    job.queue.push(Entry(0, 0, 0));
    const int64_t g = E.galloc();
    std::memcpy(E.gS.data() + g * W, rS, W * sizeof(int32_t));
    std::memcpy(E.gE.data() + g * W, rE, W * sizeof(int32_t));
    std::memcpy(E.gF.data() + g * W, rF, W * sizeof(int32_t));
    E.g_node[g] = root_node;
    E.g_parent[g] = -1;
    E.g_c[g] = 0;
    E.g_off[g] = seed_off;
    E.g_maxpos[g] = 0;
    E.g_score[g] = 0;
    job.gcols.push_back(g);
    job.col_max.push_back(root_colmax);
    E.active.push_back(j);
    return j;
}

int64_t aeng_nactive(void *h) {
    return (int64_t)((Engine *)h)->active.size();
}

// Phase 1: pop every active job; in-seed children (class a/b) process
// immediately; class-c parents are queued for Python graph traversal.
// Returns ndone; pend_nodes receives the nodes to enumerate.
int64_t aeng_step_pop(void *h, int64_t *done_out, int64_t *pend_nodes,
                      int64_t *npend_out) {
    Engine &E = *(Engine *)h;
    std::vector<int64_t> still;
    still.reserve(E.active.size());
    E.pend_jobs.clear();
    int64_t ndone = 0;
    for (int64_t j : E.active) {
        Job &job = E.jobs[j];
        const int64_t tidx = pop_parent(job);
        if (tidx < 0) {
            job.done = true;
            done_out[ndone++] = j;
            continue;
        }
        job.cur = tidx;
        still.push_back(j);
        const int64_t prow = job.gcols[tidx];
        const int64_t next_off = E.g_off[prow] + 1;
        const int64_t spos = next_off - job.seed_off0;
        const bool in_seed = spos >= 0 && spos < job.seed_len;
        const bool cls_a = in_seed && next_off < E.k;
        const bool cls_b = in_seed && !cls_a && job.ffs;
        if (cls_a || cls_b) {
            // single child from the seed path (flat.py ab_rows)
            int64_t node, ns = 0;
            if (cls_a) {
                node = job.seed_node0;
            } else {
                const int64_t ni = std::max<int64_t>(next_off - E.k + 1, 0);
                node = ni < (int64_t)job.seed_nodes.size()
                    ? job.seed_nodes[ni] : 0;
                if (node == 0)
                    ns = (E.g_node[prow] == 0) ? E.ge : E.go;
            }
            const int64_t chr = job.seed_seq[spos];
            // hull from the parent row at the pop-time cutoff
            const int32_t *Sp = E.gS.data() + prow * E.W;
            int64_t first = 0, last = E.W - 1;
            for (int64_t t = 0; t < E.W; ++t)
                if (Sp[t] >= job.cutoff) { first = t; break; }
            for (int64_t t = E.W - 1; t >= 0; --t)
                if (Sp[t] >= job.cutoff) { last = t; break; }
            const int64_t hi = std::min(last + 1, job.wsize);
            process_child(E, job, j, tidx, first, hi, node, chr, ns);
        } else {
            E.pend_jobs.push_back(j);
            pend_nodes[E.pend_jobs.size() - 1] = E.g_node[prow];
        }
    }
    E.active.swap(still);
    *npend_out = (int64_t)E.pend_jobs.size();
    return ndone;
}

// Phase 2: children for the pending parents. own[i] indexes the pend list;
// children of one parent arrive contiguous and in emission order (Python
// sorts stable by owner, matching flat.py).
void aeng_step_children(void *h, const int64_t *own, const int64_t *child,
                        const int64_t *code, int64_t n) {
    Engine &E = *(Engine *)h;
    int64_t i = 0;
    for (int64_t p = 0; p < (int64_t)E.pend_jobs.size(); ++p) {
        const int64_t j = E.pend_jobs[p];
        Job &job = E.jobs[j];
        const int64_t tidx = job.cur;
        if (i >= n || own[i] != p) {      // no children: dead-end tip
            job.tips.push_back(tidx);
            continue;
        }
        // hull at the (pop-time) cutoff — unchanged since phase 1
        const int64_t prow = job.gcols[tidx];
        const int32_t *Sp = E.gS.data() + prow * E.W;
        int64_t first = 0, last = E.W - 1;
        for (int64_t t = 0; t < E.W; ++t)
            if (Sp[t] >= job.cutoff) { first = t; break; }
        for (int64_t t = E.W - 1; t >= 0; --t)
            if (Sp[t] >= job.cutoff) { last = t; break; }
        const int64_t hi = std::min(last + 1, job.wsize);
        while (i < n && own[i] == p) {
            process_child(E, job, j, tidx, first, hi, child[i], code[i], 0);
            ++i;
        }
    }
}

// ------------------------------------------------------------- finalize
void aeng_job_sizes(void *h, int64_t j, int64_t *out) {
    Engine &E = *(Engine *)h;
    Job &job = E.jobs[j];
    out[0] = (int64_t)job.gcols.size();
    out[1] = (int64_t)job.cand.size();
    out[2] = (int64_t)job.conv_rows.size();
    out[3] = (int64_t)job.tips.size();
    out[4] = job.mcs;
    out[5] = E.g_n;
    out[6] = E.conv_n;
}

void aeng_job_cols(void *h, int64_t j, int64_t *gcols, int64_t *node,
                   int64_t *parent, int64_t *c, int64_t *off,
                   int64_t *maxpos, int64_t *score) {
    Engine &E = *(Engine *)h;
    Job &job = E.jobs[j];
    for (size_t t = 0; t < job.gcols.size(); ++t) {
        const int64_t g = job.gcols[t];
        gcols[t] = g;
        node[t] = E.g_node[g];
        parent[t] = E.g_parent[g];
        c[t] = E.g_c[g];
        off[t] = E.g_off[g];
        maxpos[t] = E.g_maxpos[g];
        score[t] = E.g_score[g];
    }
}

void aeng_job_cands(void *h, int64_t j, int64_t *out) {
    Engine &E = *(Engine *)h;
    Job &job = E.jobs[j];
    for (size_t t = 0; t < job.cand.size(); ++t) {
        const Cand &cd = job.cand[t];
        out[t * 5 + 0] = cd.tidx;
        out[t * 5 + 1] = cd.score;
        out[t * 5 + 2] = cd.offd;
        out[t * 5 + 3] = cd.pos;
        out[t * 5 + 4] = cd.tipf;
    }
}

void aeng_job_conv(void *h, int64_t j, int64_t *nodes, int64_t *rows) {
    Engine &E = *(Engine *)h;
    Job &job = E.jobs[j];
    int64_t t = 0;
    for (auto &kv : job.conv_rows) {
        nodes[t] = kv.first;
        rows[t] = kv.second;
        ++t;
    }
}

void aeng_job_tips(void *h, int64_t j, int64_t *out) {
    Engine &E = *(Engine *)h;
    Job &job = E.jobs[j];
    for (size_t t = 0; t < job.tips.size(); ++t)
        out[t] = job.tips[t];
}

void aeng_store_ptrs(void *h, int64_t *out) {
    Engine &E = *(Engine *)h;
    out[0] = (int64_t)(intptr_t)E.gS.data();
    out[1] = (int64_t)(intptr_t)E.gE.data();
    out[2] = (int64_t)(intptr_t)E.gF.data();
    out[3] = (int64_t)(intptr_t)E.CONV.data();
}

void aeng_release_job(void *h, int64_t j) {
    Engine &E = *(Engine *)h;
    Job &job = E.jobs[j];
    for (int64_t g : job.gcols)
        E.free_rows.push_back(g);
    job.gcols.clear();
    job.gcols.shrink_to_fit();
    job.col_max.clear();
    job.col_max.shrink_to_fit();
    job.cand.clear();
    job.cand.shrink_to_fit();
    job.conv_rows.clear();
    job.P.clear();
    job.P.shrink_to_fit();
}

}  // extern "C"
