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

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
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
