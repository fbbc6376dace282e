// Native runtime components for juicer_tpu.
//
// The reference implements its search-network loading and graph machinery in
// C++ (`WFSTNetwork.cpp`: text FSM parsing at `:371-618`, binary caching at
// `:1106-1419`). These are the two host-side hot spots of the TPU rebuild:
//
//   1. parse_fsm: AT&T text FSM -> flat arc arrays. WSJ-scale machines are
//      ~5.4M arcs (~150 MB text); Python-level parsing takes minutes, this
//      takes ~1 s.
//   2. closure: the offline eps/tee closure expansion that turns the
//      recursive `propagateToken` eps handling into per-arc candidate
//      tables (see decoder/artifact.py). DFS over millions of arcs is far
//      too slow in Python.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// FSM text parsing
// ---------------------------------------------------------------------------

struct FsmResult {
    int64_t n_arcs;
    int64_t n_finals;
    int32_t init_state;
    int32_t max_state;
    int32_t *src;
    int32_t *dst;
    int32_t *ilab;
    int32_t *olab;
    double *weight;
    int32_t *final_state;
    double *final_weight;
};

static double parse_double(const char *&p) {
    char *end;
    double v = strtod(p, &end);
    p = end;
    return v;
}

static long parse_long(const char *&p, bool &ok) {
    char *end;
    long v = strtol(p, &end, 10);
    ok = end != p;
    p = end;
    return v;
}

FsmResult *jtpu_parse_fsm(const char *path) {
    FILE *fd = fopen(path, "rb");
    if (!fd) return nullptr;
    fseek(fd, 0, SEEK_END);
    long size = ftell(fd);
    fseek(fd, 0, SEEK_SET);
    char *buf = (char *)malloc(size + 1);
    if (fread(buf, 1, size, fd) != (size_t)size) {
        fclose(fd);
        free(buf);
        return nullptr;
    }
    buf[size] = '\0';
    fclose(fd);

    std::vector<int32_t> src, dst, il, ol, fs;
    std::vector<double> w, fw;
    src.reserve(1 << 20);
    int32_t init_state = -1, max_state = -1;

    char *p = buf;
    char *end = buf + size;
    while (p < end) {
        // parse one line: up to 5 whitespace-separated fields. Terminate
        // the line so strtol/strtod cannot run across newlines.
        char *line_end = (char *)memchr(p, '\n', end - p);
        if (!line_end) line_end = end;
        *line_end = '\0';
        bool ok1 = false, ok2 = false, ok3 = false, ok4 = false;
        const char *q = p;
        long a = parse_long(q, ok1);
        long b = ok1 ? parse_long(q, ok2) : 0;
        long c = ok2 ? parse_long(q, ok3) : 0;
        long d = ok3 ? parse_long(q, ok4) : 0;
        if (ok4 && q <= line_end) {
            double wt = 0.0;
            // optional 5th field
            const char *q2 = q;
            char *e2;
            double cand = strtod(q2, &e2);
            if (e2 != q2 && e2 <= line_end) wt = cand;
            if (a >= 0 && b >= 0 && c >= 0 && d >= 0) {
                if (init_state < 0) init_state = (int32_t)a;
                if (a > max_state) max_state = (int32_t)a;
                if (b > max_state) max_state = (int32_t)b;
                src.push_back((int32_t)a);
                dst.push_back((int32_t)b);
                il.push_back((int32_t)c);
                ol.push_back((int32_t)d);
                w.push_back(wt);
            }
        } else if (ok1) {
            // final-state line: "state [weight]"
            double wt = 0.0;
            if (ok2) {
                // second field was parsed as long; reparse as double from q
                const char *q2 = p;
                parse_long(q2, ok1);
                wt = parse_double(q2);
            } else {
                const char *q2 = q;
                char *e2;
                double cand = strtod(q2, &e2);
                if (e2 != q2 && e2 <= line_end) wt = cand;
            }
            if (a >= 0) {
                fs.push_back((int32_t)a);
                fw.push_back(wt);
                if (a > max_state) max_state = (int32_t)a;
            }
        }
        p = line_end + 1;
    }
    free(buf);

    FsmResult *r = (FsmResult *)malloc(sizeof(FsmResult));
    r->n_arcs = (int64_t)src.size();
    r->n_finals = (int64_t)fs.size();
    r->init_state = init_state;
    r->max_state = max_state;
    r->src = (int32_t *)malloc(src.size() * 4);
    r->dst = (int32_t *)malloc(src.size() * 4);
    r->ilab = (int32_t *)malloc(src.size() * 4);
    r->olab = (int32_t *)malloc(src.size() * 4);
    r->weight = (double *)malloc(src.size() * 8);
    r->final_state = (int32_t *)malloc(fs.size() * 4 + 4);
    r->final_weight = (double *)malloc(fs.size() * 8 + 8);
    memcpy(r->src, src.data(), src.size() * 4);
    memcpy(r->dst, dst.data(), src.size() * 4);
    memcpy(r->ilab, il.data(), src.size() * 4);
    memcpy(r->olab, ol.data(), src.size() * 4);
    memcpy(r->weight, w.data(), src.size() * 8);
    memcpy(r->final_state, fs.data(), fs.size() * 4);
    memcpy(r->final_weight, fw.data(), fs.size() * 8);
    return r;
}

void jtpu_free_fsm(FsmResult *r) {
    if (!r) return;
    free(r->src);
    free(r->dst);
    free(r->ilab);
    free(r->olab);
    free(r->weight);
    free(r->final_state);
    free(r->final_weight);
    free(r);
}

// ---------------------------------------------------------------------------
// eps/tee closure expansion (see decoder/artifact.py for semantics)
// ---------------------------------------------------------------------------

struct ClosureResult {
    // entry rows: (target hmm-arc index, w_lm, w_ac, seq_off, seq_len)
    int64_t n_entries;
    int64_t *ent_row_ptr;  // per source state + 1
    int32_t *ent_arc;
    double *ent_wlm;
    double *ent_wac;
    int64_t *ent_seq_off;
    int32_t *ent_seq_len;
    // final rows: (w_lm(+final), w_ac, seq_off, seq_len)
    int64_t n_finals;
    int64_t *fin_row_ptr;
    double *fin_wlm;
    double *fin_wac;
    int64_t *fin_seq_off;
    int32_t *fin_seq_len;
    // label pool
    int64_t n_labels;
    int32_t *labels;
};

struct ClosureCtx {
    // network (CSR by source state)
    const int64_t *row_ptr;
    const int32_t *arc_dst;
    const int32_t *arc_il;
    const int32_t *arc_ol;
    const double *arc_w;
    const double *final_w;  // per state, LOG_ZERO if none
    const double *tee;      // per hmm index, LOG_ZERO if none
    const int64_t *hmm_arc_index;  // global arc id -> hmm-arc index (-1)
    double log_zero_half;
    int64_t max_entries;

    std::vector<int64_t> ent_row_ptr, fin_row_ptr, ent_seq_off, fin_seq_off;
    std::vector<int32_t> ent_arc, ent_seq_len, fin_seq_len, labels;
    std::vector<double> ent_wlm, ent_wac, fin_wlm, fin_wac;
    std::vector<int32_t> cur_seq;
    std::vector<uint8_t> on_path;
    bool overflow;
};

static void closure_visit(ClosureCtx &cx, int32_t s, double wlm, double wac) {
    if ((int64_t)cx.ent_arc.size() > cx.max_entries) {
        cx.overflow = true;
        return;
    }
    double fw = cx.final_w[s];
    if (fw > cx.log_zero_half) {
        cx.fin_wlm.push_back(wlm + fw);
        cx.fin_wac.push_back(wac);
        cx.fin_seq_off.push_back((int64_t)cx.labels.size());
        cx.fin_seq_len.push_back((int32_t)cx.cur_seq.size());
        cx.labels.insert(cx.labels.end(), cx.cur_seq.begin(), cx.cur_seq.end());
    }
    for (int64_t ai = cx.row_ptr[s]; ai < cx.row_ptr[s + 1]; ai++) {
        int32_t il = cx.arc_il[ai];
        int32_t ol = cx.arc_ol[ai];
        int32_t d = cx.arc_dst[ai];
        double w = cx.arc_w[ai];
        if (il == 0) {
            if (cx.on_path[d]) continue;  // eps cycle: cut
            size_t pushed = 0;
            if (ol != 0) { cx.cur_seq.push_back(ol); pushed = 1; }
            cx.on_path[d] = 1;
            closure_visit(cx, d, wlm + w, wac);
            cx.on_path[d] = 0;
            if (pushed) cx.cur_seq.pop_back();
        } else {
            int64_t hidx = cx.hmm_arc_index[ai];
            cx.ent_arc.push_back((int32_t)hidx);
            cx.ent_wlm.push_back(wlm + w);
            cx.ent_wac.push_back(wac);
            cx.ent_seq_off.push_back((int64_t)cx.labels.size());
            cx.ent_seq_len.push_back((int32_t)cx.cur_seq.size());
            cx.labels.insert(cx.labels.end(), cx.cur_seq.begin(), cx.cur_seq.end());
            double tee = cx.tee[il - 1];
            if (tee > cx.log_zero_half) {
                if (cx.on_path[d]) continue;
                size_t pushed = 0;
                if (ol != 0) { cx.cur_seq.push_back(ol); pushed = 1; }
                cx.on_path[d] = 1;
                closure_visit(cx, d, wlm + w, wac + tee);
                cx.on_path[d] = 0;
                if (pushed) cx.cur_seq.pop_back();
            }
        }
    }
}

ClosureResult *jtpu_closure(
    int64_t n_states,
    const int64_t *row_ptr,
    const int32_t *arc_dst,
    const int32_t *arc_il,
    const int32_t *arc_ol,
    const double *arc_w,
    const double *final_w,
    const double *tee,
    const int64_t *hmm_arc_index,
    int64_t max_entries_per_state
) {
    ClosureCtx cx;
    cx.row_ptr = row_ptr;
    cx.arc_dst = arc_dst;
    cx.arc_il = arc_il;
    cx.arc_ol = arc_ol;
    cx.arc_w = arc_w;
    cx.final_w = final_w;
    cx.tee = tee;
    cx.hmm_arc_index = hmm_arc_index;
    cx.log_zero_half = -5.0e29;
    cx.overflow = false;
    cx.on_path.assign(n_states, 0);
    cx.ent_row_ptr.push_back(0);
    cx.fin_row_ptr.push_back(0);

    for (int64_t s = 0; s < n_states; s++) {
        cx.max_entries = (int64_t)cx.ent_arc.size() + max_entries_per_state;
        cx.on_path[s] = 1;
        closure_visit(cx, (int32_t)s, 0.0, 0.0);
        cx.on_path[s] = 0;
        cx.ent_row_ptr.push_back((int64_t)cx.ent_arc.size());
        cx.fin_row_ptr.push_back((int64_t)cx.fin_wlm.size());
        if (cx.overflow) return nullptr;
    }

    ClosureResult *r = (ClosureResult *)malloc(sizeof(ClosureResult));
#define COPY(vec, field, type)                                        \
    r->field = (type *)malloc((vec.size() + 1) * sizeof(type));       \
    memcpy(r->field, vec.data(), vec.size() * sizeof(type));
    r->n_entries = (int64_t)cx.ent_arc.size();
    r->n_finals = (int64_t)cx.fin_wlm.size();
    r->n_labels = (int64_t)cx.labels.size();
    COPY(cx.ent_row_ptr, ent_row_ptr, int64_t)
    COPY(cx.ent_arc, ent_arc, int32_t)
    COPY(cx.ent_wlm, ent_wlm, double)
    COPY(cx.ent_wac, ent_wac, double)
    COPY(cx.ent_seq_off, ent_seq_off, int64_t)
    COPY(cx.ent_seq_len, ent_seq_len, int32_t)
    COPY(cx.fin_row_ptr, fin_row_ptr, int64_t)
    COPY(cx.fin_wlm, fin_wlm, double)
    COPY(cx.fin_wac, fin_wac, double)
    COPY(cx.fin_seq_off, fin_seq_off, int64_t)
    COPY(cx.fin_seq_len, fin_seq_len, int32_t)
    COPY(cx.labels, labels, int32_t)
#undef COPY
    return r;
}

void jtpu_free_closure(ClosureResult *r) {
    if (!r) return;
    free(r->ent_row_ptr);
    free(r->ent_arc);
    free(r->ent_wlm);
    free(r->ent_wac);
    free(r->ent_seq_off);
    free(r->ent_seq_len);
    free(r->fin_row_ptr);
    free(r->fin_wlm);
    free(r->fin_wac);
    free(r->fin_seq_off);
    free(r->fin_seq_len);
    free(r->labels);
    free(r);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Weighted determinization (subset construction with string residuals)
//
// The native twin of fst/algos.determinize: identical semantics (epsilon
// treated as a regular symbol, gallic string residuals, weight keys
// quantized at 1e-6 with round-half-to-even like Python round()), built
// for the offline pipeline's WSJ-scale det(L.G) where the pure-Python
// subset construction is the dominant cost (PERF.md S2b: ~18 min of a
// 21-min 20k-word build). Emits arcs/finals with interned output-string
// ids; the Python wrapper does the eps-chain factoring.
// ---------------------------------------------------------------------------

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();
constexpr double kKeyDelta = 1e-6;

inline double det_plus(int32_t semiring, double a, double b) {
    if (semiring == 0) return a <= b ? a : b;  // tropical
    if (a == kInf) return b;
    if (b == kInf) return a;
    double lo = a <= b ? a : b, hi = a <= b ? b : a;
    return lo - log1p(exp(lo - hi));
}

inline int64_t det_qw(double w) {
    if (w == kInf) return (int64_t)1 << 62;
    // match Python round(): nearest, ties to even
    return (int64_t)nearbyint(w / kKeyDelta);
}

struct DetElem {
    int32_t state;
    int32_t ostr;
    double w;
};

struct StrPool {
    std::vector<int32_t> labels;
    std::vector<int64_t> off;
    std::vector<int32_t> len;
    std::unordered_map<std::string, int32_t> index;
    std::unordered_map<int64_t, int32_t> extend_memo;

    StrPool() { intern(nullptr, 0); }  // id 0 = empty string

    int32_t intern(const int32_t *labs, int32_t n) {
        std::string key((const char *)labs, (size_t)n * sizeof(int32_t));
        auto it = index.find(key);
        if (it != index.end()) return it->second;
        int32_t id = (int32_t)off.size();
        off.push_back((int64_t)labels.size());
        len.push_back(n);
        labels.insert(labels.end(), labs, labs + n);
        index.emplace(std::move(key), id);
        return id;
    }

    int32_t extend(int32_t base, int32_t lab) {
        int64_t memo_key = ((int64_t)base << 32) | (uint32_t)lab;
        auto it = extend_memo.find(memo_key);
        if (it != extend_memo.end()) return it->second;
        std::vector<int32_t> tmp(labels.begin() + off[base],
                                 labels.begin() + off[base] + len[base]);
        tmp.push_back(lab);
        int32_t id = intern(tmp.data(), (int32_t)tmp.size());
        extend_memo.emplace(memo_key, id);
        return id;
    }

    int32_t suffix(int32_t base, int32_t skip) {
        if (skip == 0) return base;
        return intern(labels.data() + off[base] + skip, len[base] - skip);
    }
};

}  // namespace

extern "C" {

struct DetResult {
    int64_t n_states;
    int64_t n_arcs;
    int32_t *arc_src;
    int32_t *arc_dst;
    int32_t *arc_il;
    int32_t *arc_ostr;  // string id
    double *arc_w;
    int64_t n_finals;
    int32_t *fin_sid;
    int32_t *fin_ostr;
    double *fin_w;
    // string table
    int64_t n_strs;
    int64_t *str_off;
    int32_t *str_len;
    int32_t *str_labels;
    int64_t n_labels;
    int32_t error;  // 1 = subset blow-up
};

DetResult *jtpu_determinize(
    int64_t n_states,
    int32_t start,
    const int64_t *row_ptr,
    const int32_t *arc_dst,
    const int32_t *arc_il,
    const int32_t *arc_ol,
    const double *arc_w,
    const double *final_w,  // per state, +inf if not final
    int32_t semiring,       // 0 = tropical, 1 = log
    int64_t max_subsets
) {
    (void)n_states;
    StrPool strs;
    std::unordered_map<std::string, int32_t> smap;
    std::deque<std::vector<DetElem>> queue_subsets;
    std::deque<int32_t> queue_sids;
    int64_t n_det_states = 0;
    bool overflow = false;

    std::vector<int32_t> out_src, out_dst, out_il, out_ostr;
    std::vector<double> out_w;
    std::vector<int32_t> out_fsid, out_fostr;
    std::vector<double> out_fw;

    auto canon_key = [](std::vector<DetElem> &subset) {
        std::sort(subset.begin(), subset.end(),
                  [](const DetElem &a, const DetElem &b) {
                      if (a.state != b.state) return a.state < b.state;
                      return a.ostr < b.ostr;
                  });
        std::string key;
        key.reserve(subset.size() * 16);
        for (const DetElem &e : subset) {
            int64_t q = det_qw(e.w);
            key.append((const char *)&e.state, sizeof(e.state));
            key.append((const char *)&q, sizeof(q));
            key.append((const char *)&e.ostr, sizeof(e.ostr));
        }
        return key;
    };

    auto get_state = [&](std::vector<DetElem> subset) -> int32_t {
        std::string key = canon_key(subset);
        auto it = smap.find(key);
        if (it != smap.end()) return it->second;
        int32_t sid = (int32_t)n_det_states++;
        smap.emplace(std::move(key), sid);
        queue_subsets.push_back(std::move(subset));
        queue_sids.push_back(sid);
        return sid;
    };

    get_state({{start, 0, 0.0}});

    struct Cand {
        int32_t il, dst, ostr;
        double w;
    };
    std::vector<Cand> cands;

    while (!queue_subsets.empty()) {
        std::vector<DetElem> subset = std::move(queue_subsets.front());
        queue_subsets.pop_front();
        int32_t sid = queue_sids.front();
        queue_sids.pop_front();

        // finality, grouped by residual string
        {
            std::unordered_map<int32_t, double> finals;
            for (const DetElem &e : subset) {
                double fw = final_w[e.state];
                if (fw != kInf) {
                    double tw = e.w + fw;
                    auto it = finals.find(e.ostr);
                    if (it == finals.end())
                        finals.emplace(e.ostr, tw);
                    else
                        it->second = det_plus(semiring, it->second, tw);
                }
            }
            for (auto &kv : finals) {
                out_fsid.push_back(sid);
                out_fostr.push_back(kv.first);
                out_fw.push_back(kv.second);
            }
        }

        // expand all member arcs, group by (il, dst, nstr)
        cands.clear();
        for (const DetElem &e : subset) {
            for (int64_t ai = row_ptr[e.state]; ai < row_ptr[e.state + 1];
                 ai++) {
                int32_t ol = arc_ol[ai];
                int32_t nstr =
                    ol == 0 ? e.ostr : strs.extend(e.ostr, ol);
                cands.push_back(
                    {arc_il[ai], arc_dst[ai], nstr, e.w + arc_w[ai]});
            }
        }
        std::sort(cands.begin(), cands.end(),
                  [](const Cand &a, const Cand &b) {
                      if (a.il != b.il) return a.il < b.il;
                      if (a.dst != b.dst) return a.dst < b.dst;
                      return a.ostr < b.ostr;
                  });
        size_t i = 0, n = cands.size();
        while (i < n) {
            // one input-label group [i, jend)
            size_t jend = i;
            int32_t il = cands[i].il;
            while (jend < n && cands[jend].il == il) jend++;
            // combine duplicate (dst, ostr) and fold the group total
            size_t wpos = i;
            double total = kInf;
            for (size_t j = i; j < jend;) {
                size_t k = j + 1;
                double cw = cands[j].w;
                while (k < jend && cands[k].dst == cands[j].dst &&
                       cands[k].ostr == cands[j].ostr) {
                    cw = det_plus(semiring, cw, cands[k].w);
                    k++;
                }
                cands[wpos] = cands[j];
                cands[wpos].w = cw;
                total = det_plus(semiring, total, cw);
                wpos++;
                j = k;
            }
            // common output prefix across the group
            int32_t p0 = cands[i].ostr;
            int32_t plen = strs.len[p0];
            for (size_t j = i + 1; j < wpos && plen > 0; j++) {
                int32_t o = cands[j].ostr;
                int32_t m = strs.len[o] < plen ? strs.len[o] : plen;
                int32_t k = 0;
                const int32_t *a = strs.labels.data() + strs.off[p0];
                const int32_t *b = strs.labels.data() + strs.off[o];
                while (k < m && a[k] == b[k]) k++;
                plen = k;
            }
            int32_t prefix = strs.suffix(p0, 0);
            if (plen < strs.len[p0])
                prefix = strs.intern(strs.labels.data() + strs.off[p0], plen);
            // residual subset
            std::vector<DetElem> nsub;
            nsub.reserve(wpos - i);
            for (size_t j = i; j < wpos; j++) {
                double rw = cands[j].w == kInf ? kInf : cands[j].w - total;
                nsub.push_back(
                    {cands[j].dst, strs.suffix(cands[j].ostr, plen), rw});
            }
            int32_t nsid = get_state(std::move(nsub));
            out_src.push_back(sid);
            out_dst.push_back(nsid);
            out_il.push_back(il);
            out_ostr.push_back(prefix);
            out_w.push_back(total);
            i = jend;
        }

        if (n_det_states > max_subsets) {
            overflow = true;
            break;
        }
    }

    DetResult *r = (DetResult *)malloc(sizeof(DetResult));
    memset(r, 0, sizeof(DetResult));
    r->error = overflow ? 1 : 0;
    if (!overflow) {
        r->n_states = n_det_states;
        r->n_arcs = (int64_t)out_src.size();
        r->n_finals = (int64_t)out_fsid.size();
        r->n_strs = (int64_t)strs.off.size();
        r->n_labels = (int64_t)strs.labels.size();
#define DCOPY(vec, field, type)                                   \
    r->field = (type *)malloc((vec.size() + 1) * sizeof(type));   \
    memcpy(r->field, vec.data(), vec.size() * sizeof(type));
        DCOPY(out_src, arc_src, int32_t)
        DCOPY(out_dst, arc_dst, int32_t)
        DCOPY(out_il, arc_il, int32_t)
        DCOPY(out_ostr, arc_ostr, int32_t)
        DCOPY(out_w, arc_w, double)
        DCOPY(out_fsid, fin_sid, int32_t)
        DCOPY(out_fostr, fin_ostr, int32_t)
        DCOPY(out_fw, fin_w, double)
        DCOPY(strs.off, str_off, int64_t)
        DCOPY(strs.len, str_len, int32_t)
        DCOPY(strs.labels, str_labels, int32_t)
#undef DCOPY
    }
    return r;
}

void jtpu_free_determinize(DetResult *r) {
    if (!r) return;
    free(r->arc_src);
    free(r->arc_dst);
    free(r->arc_il);
    free(r->arc_ostr);
    free(r->arc_w);
    free(r->fin_sid);
    free(r->fin_ostr);
    free(r->fin_w);
    free(r->str_off);
    free(r->str_len);
    free(r->str_labels);
    free(r);
}

}  // extern "C"
