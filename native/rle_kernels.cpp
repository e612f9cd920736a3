// Native RLE kernels for the host-side COCO evaluation path.
//
// TPU-native framework equivalent of the reference's C mask library
// (reference: cocoapi/common/maskApi.c — the only host-side native
// component the original keeps hot during evaluation). Re-implemented
// from the COCO RLE specification: column-major alternating runs,
// crowd-aware IoU via two-pointer run merging (no dense decode).
//
// Exposed as a C ABI for ctypes; maskrcnn_tpu/eval/rle.py falls back to
// pure numpy when the shared object is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Run-length encode a column-major binary buffer.
// mask: n bytes (0/1). counts_out must hold n+1 entries.
// Returns the number of runs written.
int rle_encode(const uint8_t* mask, int64_t n, uint32_t* counts_out) {
    int64_t k = 0;
    uint8_t prev = 0;
    uint32_t run = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (mask[i] != prev) {
            counts_out[k++] = run;
            run = 0;
            prev = mask[i];
        }
        ++run;
    }
    counts_out[k++] = run;
    return static_cast<int>(k);
}

// Decode runs into a column-major binary buffer of length n.
void rle_decode(const uint32_t* counts, int m, uint8_t* out, int64_t n) {
    uint8_t v = 0;
    int64_t pos = 0;
    for (int j = 0; j < m && pos < n; ++j) {
        int64_t c = counts[j];
        if (c > n - pos) c = n - pos;
        std::memset(out + pos, v, static_cast<size_t>(c));
        pos += c;
        v = !v;
    }
    if (pos < n) std::memset(out + pos, 0, static_cast<size_t>(n - pos));
}

// Foreground area of a run list.
uint64_t rle_area(const uint32_t* counts, int m) {
    uint64_t a = 0;
    for (int j = 1; j < m; j += 2) a += counts[j];
    return a;
}

// Intersection of two run lists via two-pointer merge. Also returns the
// individual areas so the caller computes any union flavour.
void rle_intersection(const uint32_t* a, int ma, const uint32_t* b, int mb,
                      uint64_t* inter_out, uint64_t* area_a_out,
                      uint64_t* area_b_out) {
    uint64_t inter = 0;
    uint64_t ca = ma > 0 ? a[0] : 0, cb = mb > 0 ? b[0] : 0;
    int ia = 1, ib = 1;
    bool va = false, vb = false;
    while (true) {
        uint64_t c = std::min(ca, cb);
        if (va && vb) inter += c;
        ca -= c;
        cb -= c;
        bool progressed = false;
        if (ca == 0 && ia < ma) { ca = a[ia++]; va = !va; progressed = true; }
        if (cb == 0 && ib < mb) { cb = b[ib++]; vb = !vb; progressed = true; }
        if (ca == 0 && cb == 0) break;
        if (!progressed && (ca == 0 || cb == 0)) break;  // exhausted one
    }
    *inter_out = inter;
    *area_a_out = rle_area(a, ma);
    *area_b_out = rle_area(b, mb);
}

// Pairwise IoU between m dt and n gt run lists.
// dt_counts/gt_counts: concatenated runs; dt_off/gt_off: prefix offsets
// (len m+1 / n+1). iscrowd: per-gt flag (union = area(dt)).
// out: [m * n] row-major (dt-major).
void rle_iou_matrix(const uint32_t* dt_counts, const int64_t* dt_off,
                    int m, const uint32_t* gt_counts,
                    const int64_t* gt_off, int n,
                    const uint8_t* iscrowd, double* out) {
    for (int d = 0; d < m; ++d) {
        const uint32_t* a = dt_counts + dt_off[d];
        int ma = static_cast<int>(dt_off[d + 1] - dt_off[d]);
        for (int g = 0; g < n; ++g) {
            const uint32_t* b = gt_counts + gt_off[g];
            int mb = static_cast<int>(gt_off[g + 1] - gt_off[g]);
            uint64_t inter, aa, ab;
            rle_intersection(a, ma, b, mb, &inter, &aa, &ab);
            double u;
            if (inter == 0) {
                out[d * n + g] = 0.0;
                continue;
            }
            if (iscrowd && iscrowd[g]) u = static_cast<double>(aa);
            else u = static_cast<double>(aa + ab - inter);
            out[d * n + g] = u > 0 ? static_cast<double>(inter) / u : 0.0;
        }
    }
}

}  // extern "C"
