// Native host-side components (C++17, no external deps).
//
// The reference implements its whole host runtime natively (Rust); these are
// the rebuild's native equivalents for the two host-side hot paths:
//
//  1. mtx_parse_body — MatrixMarket coordinate-body parsing (the reference
//     shells into scipy via pyo3, py2rust.rs:62-97; here a single-pass
//     strtoll/strtod tokenizer, much faster than numpy text splitting).
//  2. traffic_simulate — the functional traffic model's fiber-cache walk
//     (models/traffic.py semantics; reference storage.rs:460-1007): the
//     reference-exact priority cache — min-heap of [priority, addr] with
//     lazy invalidation, priority = A-traversal position of the most recent
//     access (psum rows: their own address) — and reference-exact word
//     counters, for the default full-K row-wise schedule (one psum per row;
//     the windowed merge path stays in Python).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// 1. MatrixMarket coordinate-body parser
// ---------------------------------------------------------------------------
// Parses `nnz` entries of "row col [val]" (1-based) from text[0:len] into
// caller-allocated arrays.  Returns entries parsed (< nnz on malformed
// input).  field_pattern != 0: no value column (pattern matrices -> 1.0).
int64_t mtx_parse_body(const char* text, int64_t len, int64_t nnz,
                       int field_pattern, int64_t* rows, int64_t* cols,
                       double* vals) {
    const char* p = text;
    const char* end = text + len;
    int64_t n = 0;
    auto skip_ws = [&]() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r')) ++p;
    };
    auto parse_int = [&](int64_t* out) -> bool {
        skip_ws();
        if (p >= end) return false;
        char* q;
        long long v = strtoll(p, &q, 10);
        if (q == p) return false;
        p = q;
        *out = (int64_t)v;
        return true;
    };
    auto parse_f = [&](double* out) -> bool {
        skip_ws();
        if (p >= end) return false;
        char* q;
        double v = strtod(p, &q);
        if (q == p) return false;
        p = q;
        *out = v;
        return true;
    };
    while (n < nnz) {
        int64_t r, c;
        if (!parse_int(&r) || !parse_int(&c)) break;
        double v = 1.0;
        if (!field_pattern && !parse_f(&v)) break;
        rows[n] = r - 1;
        cols[n] = c - 1;
        vals[n] = v;
        ++n;
    }
    return n;
}

// ---------------------------------------------------------------------------
// 2. Functional traffic model cache walk (full-K rows, one psum per row)
// ---------------------------------------------------------------------------
// Counter semantics (see models/traffic.py for the file:line citations):
//   row of L elements = 2L words; scalar read = 2 words; B rows clean-drop
//   on eviction, psum rows write back to DRAM.  Eviction is the reference's
//   policy (LatencyPriorityCache, storage.rs:546-658): pop the MINIMUM
//   [priority, addr] from a lazily-invalidated heap, where priority is the
//   A-traversal position of the row's most recent access (psum rows: their
//   own address, which sits above output_base = b_rows + 1).  Miss fills
//   count miss + cache_write but NOT cache_read (storage.rs:792-818).
//
// Inputs: A's CSR structure, B row lengths, traversal order, per-traversed-
// row merged-psum nnz (row_psum_nnz[i] for row_order[i], computed in numpy).
// Output counters (out[15]):
//   0 a_mem_read    1 b_mem_read     2 psum_mem_read  3 psum_mem_write
//   4 miss          5 b_evict        6 psum_evict     7 b_touched
//   8 b_distinct    9 c_touched     10 cache_read    11 cache_write
//  12 c_final      13 max_occupancy 14 fill_count

struct HeapEnt {
    int64_t prio;
    int64_t addr;
    // std::priority_queue is a max-heap; invert to pop the MINIMUM
    // [prio, addr] like the reference's BinaryHeap<Reverse<[usize;2]>>.
    bool operator<(const HeapEnt& o) const {
        if (prio != o.prio) return prio > o.prio;
        return addr > o.addr;
    }
};

int traffic_simulate(const int64_t* a_indptr, const int32_t* a_indices,
                     int64_t a_rows, const int64_t* b_row_lens,
                     int64_t b_rows, const int64_t* row_order,
                     int64_t capacity_words, const int64_t* row_psum_nnz,
                     int64_t* out) {
    for (int i = 0; i < 15; ++i) out[i] = 0;
    int64_t& a_read = out[0];
    int64_t& b_read = out[1];
    int64_t& psum_write = out[3];
    int64_t& miss = out[4];
    int64_t& b_evict = out[5];
    int64_t& p_evict = out[6];
    int64_t& b_touched = out[7];
    int64_t& b_distinct = out[8];
    int64_t& c_touched = out[9];
    int64_t& cache_read = out[10];
    int64_t& cache_write = out[11];
    int64_t& c_final = out[12];
    int64_t& max_occ = out[13];
    int64_t& fills = out[14];

    const int64_t output_base = b_rows + 1;  // psum addr space (main.rs:65)
    std::unordered_map<int64_t, int64_t> resident;  // addr -> words
    std::unordered_map<int64_t, int64_t> prio;      // valid_pq_row_dict
    std::priority_queue<HeapEnt> heap;
    int64_t occ = 0, b_occ = 0;
    std::vector<char> b_seen((size_t)b_rows, 0);

    auto bump = [&](int64_t addr, int64_t p) {
        auto it = prio.find(addr);
        int64_t np_ = (it == prio.end()) ? p : std::max(it->second, p);
        prio[addr] = np_;
        heap.push({np_, addr});
    };

    auto insert = [&](int64_t addr, int64_t words, int64_t p) {
        // freeup_space (storage.rs:599-658)
        while (occ + words > capacity_words) {
            int64_t victim = -1;
            if (b_occ < words) {
                // resident B rows can't cover it: take the lowest-addr psum
                // (storage.rs:603-611; reference takes HashMap order)
                int64_t best = INT64_MAX;
                for (const auto& kv : resident)
                    if (kv.first >= output_base && kv.first != addr &&
                        kv.first < best)
                        best = kv.first;
                if (best != INT64_MAX) victim = best;
            }
            if (victim < 0) {
                while (!heap.empty()) {
                    HeapEnt e = heap.top();
                    heap.pop();
                    auto it = resident.find(e.addr);
                    if (it == resident.end()) continue;          // stale
                    auto pit = prio.find(e.addr);
                    if (pit == prio.end() || pit->second != e.prio) continue;
                    if (e.addr == addr) continue;   // pinned (self)
                    victim = e.addr;
                    break;
                }
            }
            if (victim < 0) return;  // nothing evictable: stream (no panic)
            int64_t w = resident[victim];
            occ -= w;
            resident.erase(victim);
            if (victim < output_base) {
                b_occ -= w;
                b_evict += w;        // clean drop
            } else {
                p_evict += w;
                psum_write += w;     // write-back
            }
        }
        if (occ + words <= capacity_words) {
            resident[addr] = words;
            occ += words;
            if (addr < output_base) b_occ += words;
            bump(addr, p);
            if (occ > max_occ) max_occ = occ;
        }
    };

    int64_t psum_uid = 0;
    for (int64_t i = 0; i < a_rows; ++i) {
        int64_t r = row_order[i];
        int64_t s = a_indptr[r], e = a_indptr[r + 1];
        if (e == s) continue;
        a_read += 2 * (e - s);
        for (int64_t j = s; j < e; ++j) {
            int64_t k = (int64_t)a_indices[j];
            int64_t words = 2 * b_row_lens[k];
            if (!words) continue;
            b_touched += words;
            if (!b_seen[(size_t)k]) {
                b_seen[(size_t)k] = 1;
                b_distinct += words;
            }
            if (resident.count(k)) {
                cache_read += words;   // hit readout (storage.rs:775-791)
                bump(k, i);
            } else {
                b_read += words;       // DRAM fill; readout NOT a cache read
                miss += words;
                ++fills;
                cache_write += words;
                insert(k, words, i);
            }
        }
        int64_t pw = 2 * row_psum_nnz[i];
        if (pw) {
            c_touched += pw;
            cache_write += pw;
            int64_t addr = output_base + psum_uid++;
            insert(addr, pw, addr);  // fresh psum prio = its own address
            // finished row: swap out to DRAM immediately
            auto it = resident.find(addr);
            if (it != resident.end()) {
                occ -= it->second;
                resident.erase(it);
            }
            psum_write += pw;
            c_final += pw;
        }
    }
    return 0;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------------
// 3. Belady VMEM slot planner (ops/cacheplan.py, native for large worklists)
// ---------------------------------------------------------------------------
// Exact port of plan_tile_cache: victim = among slots with
// last_use < w - depth, the one with the furthest next use (ties: lowest
// slot index, matching np.argmax).  Returns n_loads, or -1 on deadlock.
int64_t plan_tile_cache(const int64_t* tile_ids, int64_t W, int64_t n_slots,
                        int64_t depth, int32_t* slot_out, int32_t* load_out) {
    if (W == 0) return 0;
    int64_t max_tile = 0;
    for (int64_t w = 0; w < W; ++w)
        if (tile_ids[w] > max_tile) max_tile = tile_ids[w];

    const int64_t INF = INT64_MAX / 2;
    std::vector<int64_t> nxt(W, INF);
    {
        std::vector<int64_t> last((size_t)max_tile + 1, -1);
        for (int64_t w = W - 1; w >= 0; --w) {
            int64_t t = tile_ids[w];
            if (last[(size_t)t] >= 0) nxt[w] = last[(size_t)t];
            last[(size_t)t] = w;
        }
    }

    std::vector<int64_t> tile_slot((size_t)max_tile + 1, -1);
    std::vector<int64_t> slot_tile(n_slots, -1);
    std::vector<int64_t> slot_next(n_slots, -1);
    std::vector<int64_t> slot_last(n_slots, INT64_MIN / 2);
    int64_t n_free = n_slots;   // slots n_slots-n_free.. are taken in order
    int64_t n_loads = 0;

    for (int64_t w = 0; w < W; ++w) {
        int64_t t = tile_ids[w];
        int64_t s = tile_slot[(size_t)t];
        if (s >= 0) {
            slot_out[w] = (int32_t)s;
            load_out[w] = 0;
            slot_next[s] = nxt[w];
            slot_last[s] = w;
            continue;
        }
        if (n_free > 0) {
            s = n_slots - n_free;   // matches python free-list pop order
            --n_free;
        } else {
            int64_t best = -1, best_next = INT64_MIN;
            for (int64_t c = 0; c < n_slots; ++c) {
                if (slot_last[c] < w - depth && slot_next[c] > best_next) {
                    best_next = slot_next[c];
                    best = c;
                }
            }
            if (best < 0) return -1;
            s = best;
            tile_slot[(size_t)slot_tile[s]] = -1;
        }
        tile_slot[(size_t)t] = s;
        slot_tile[s] = t;
        slot_next[s] = nxt[w];
        slot_last[s] = w;
        slot_out[w] = (int32_t)s;
        load_out[w] = 1;
        ++n_loads;
    }
    return n_loads;
}

}  // extern "C"
