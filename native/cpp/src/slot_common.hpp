// Shared utilities for the native slot-bank tracker cores.
//
// These cores mirror the repo's TPU struct-of-arrays design (see
// boxmot_tpu/trackers/bytetrack.py): fixed-capacity slot arrays advanced
// by one step() per frame — NOT the reference's per-track object design
// (reference native layer: boxmot/native/cpp/trackers/*).  They provide
// the same deployment role as the reference's C++ cores: a dependency-free
// CPU path behind a flat C ABI for hosts without a TPU runtime.

#ifndef BOXMOT_SLOT_COMMON_HPP
#define BOXMOT_SLOT_COMMON_HPP

#include <cmath>
#include <cstdint>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" int bmt_lapjv(const double* cost, int64_t n_rows, int64_t n_cols,
                         double limit, int32_t* r2c);

namespace boxmot {

// ---------------------------------------------------------------------
// Config parsing: "key=value;key=value" strings (no JSON dependency).
// ---------------------------------------------------------------------
inline std::unordered_map<std::string, double> parse_config(const char* s) {
    std::unordered_map<std::string, double> kv;
    if (!s) return kv;
    std::string str(s);
    size_t pos = 0;
    while (pos < str.size()) {
        size_t end = str.find(';', pos);
        if (end == std::string::npos) end = str.size();
        std::string item = str.substr(pos, end - pos);
        size_t eq = item.find('=');
        if (eq != std::string::npos) {
            std::string key = item.substr(0, eq);
            try {
                kv[key] = std::stod(item.substr(eq + 1));
            } catch (...) {
            }
        }
        pos = end + 1;
    }
    return kv;
}

inline double cfg_get(const std::unordered_map<std::string, double>& kv,
                      const std::string& key, double dflt) {
    auto it = kv.find(key);
    return it == kv.end() ? dflt : it->second;
}

// ---------------------------------------------------------------------
// Pairwise IoU of xyxy boxes (mirrors boxmot_tpu/ops/iou.py iou_batch).
// ---------------------------------------------------------------------
inline float iou_xyxy(const float* a, const float* b) {
    float xx1 = std::max(a[0], b[0]);
    float yy1 = std::max(a[1], b[1]);
    float xx2 = std::min(a[2], b[2]);
    float yy2 = std::min(a[3], b[3]);
    float w = std::max(0.0f, xx2 - xx1);
    float h = std::max(0.0f, yy2 - yy1);
    float inter = w * h;
    float area_a = (a[2] - a[0]) * (a[3] - a[1]);
    float area_b = (b[2] - b[0]) * (b[3] - b[1]);
    float uni = area_a + area_b - inter;
    return inter / std::max(uni, 1e-12f);
}

// ---------------------------------------------------------------------
// Association-function family over xyxy boxes, numeric-coded so cores
// can honor the configured asso_func (mirrors boxmot_tpu/ops/iou.py
// ASSO_FUNCS; codes assigned by boxmot_tpu/native/trackers.py).
// giou/diou/ciou are rescaled from (-1,1] to (0,1] exactly like the
// device versions so thresholds compare in the same space.
// ---------------------------------------------------------------------
enum AssoCode : int {
    kAssoIoU = 0,
    kAssoGIoU = 1,
    kAssoDIoU = 2,
    kAssoCIoU = 3,
    kAssoHMIoU = 4,
};

inline float asso_xyxy(int code, const float* a, const float* b) {
    float xx1 = std::max(a[0], b[0]);
    float yy1 = std::max(a[1], b[1]);
    float xx2 = std::min(a[2], b[2]);
    float yy2 = std::min(a[3], b[3]);
    float inter = std::max(0.0f, xx2 - xx1) * std::max(0.0f, yy2 - yy1);
    float area_a = (a[2] - a[0]) * (a[3] - a[1]);
    float area_b = (b[2] - b[0]) * (b[3] - b[1]);
    float uni = std::max(area_a + area_b - inter, 1e-12f);
    float iou = inter / uni;
    if (code == kAssoIoU) return iou;
    if (code == kAssoHMIoU) {
        // height-modulated IoU (ops/iou.py hmiou_batch)
        float o1 = std::min(a[3], b[3]) - std::max(a[1], b[1]);
        float o2 = std::max(a[3], b[3]) - std::min(a[1], b[1]);
        float hm = std::max(0.0f, o1) / std::max(o2, 1e-12f);
        return hm * iou;
    }
    float xc1 = std::min(a[0], b[0]);
    float yc1 = std::min(a[1], b[1]);
    float xc2 = std::max(a[2], b[2]);
    float yc2 = std::max(a[3], b[3]);
    if (code == kAssoGIoU) {
        float enc = std::max((xc2 - xc1) * (yc2 - yc1), 1e-12f);
        float giou = iou - (enc - uni) / enc;
        return (giou + 1.0f) / 2.0f;
    }
    float cxa = (a[0] + a[2]) * 0.5f, cya = (a[1] + a[3]) * 0.5f;
    float cxb = (b[0] + b[2]) * 0.5f, cyb = (b[1] + b[3]) * 0.5f;
    float inner = (cxa - cxb) * (cxa - cxb) + (cya - cyb) * (cya - cyb);
    float ow = xc2 - xc1, oh = yc2 - yc1;
    float outer = std::max(ow * ow + oh * oh, 1e-12f);
    if (code == kAssoDIoU) {
        float diou = iou - inner / outer;
        return (diou + 1.0f) / 2.0f;
    }
    // ciou (ops/iou.py ciou_batch — note the +alpha*v sign there,
    // mirroring the reference's iou.py:277-343)
    float wa = std::max(a[2] - a[0], 1e-12f), ha = std::max(a[3] - a[1], 1e-12f);
    float wb = std::max(b[2] - b[0], 1e-12f), hb = std::max(b[3] - b[1], 1e-12f);
    float v = 4.0f / (static_cast<float>(M_PI) * static_cast<float>(M_PI));
    float d = std::atan(wb / hb) - std::atan(wa / ha);
    v *= d * d;
    float alpha = v / std::max(1.0f - iou + v, 1e-12f);
    float ciou = iou - inner / outer + alpha * v;
    return (ciou + 1.0f) / 2.0f;
}

// ---------------------------------------------------------------------
// Masked linear assignment with lapjv cost_limit semantics over slot
// rows and detection columns: builds the compact valid submatrix, solves
// exactly with the shared JV (bmt_lapjv), and scatters back to slot
// indexing.  Pairs with cost >= thresh are excluded (strict, matching
// boxmot_tpu/ops/lap.py masked_assignment's w > 0 rule).
// Returns r2c of size n_rows: det column per slot row or -1.
// ---------------------------------------------------------------------
inline std::vector<int32_t> masked_assignment(
    const std::vector<double>& cost, int64_t n_rows, int64_t n_cols,
    const std::vector<char>& row_mask, const std::vector<char>& col_mask,
    double thresh) {
    std::vector<int32_t> out(static_cast<size_t>(n_rows), -1);
    std::vector<int32_t> rows, cols;
    for (int64_t i = 0; i < n_rows; ++i)
        if (row_mask[static_cast<size_t>(i)]) rows.push_back(static_cast<int32_t>(i));
    for (int64_t j = 0; j < n_cols; ++j)
        if (col_mask[static_cast<size_t>(j)]) cols.push_back(static_cast<int32_t>(j));
    if (rows.empty() || cols.empty()) return out;
    const int64_t n = static_cast<int64_t>(rows.size());
    const int64_t m = static_cast<int64_t>(cols.size());
    const double excluded = thresh + 1e6;  // > limit: JV prefers the dummies
    std::vector<double> sub(static_cast<size_t>(n * m));
    for (int64_t i = 0; i < n; ++i)
        for (int64_t j = 0; j < m; ++j) {
            double c = cost[static_cast<size_t>(rows[i]) * n_cols + cols[j]];
            sub[static_cast<size_t>(i * m + j)] = (c >= thresh) ? excluded : c;
        }
    std::vector<int32_t> r2c(static_cast<size_t>(n), -1);
    if (bmt_lapjv(sub.data(), n, m, thresh, r2c.data()) != 0) return out;
    for (int64_t i = 0; i < n; ++i) {
        int32_t j = r2c[static_cast<size_t>(i)];
        if (j < 0) continue;
        double c = cost[static_cast<size_t>(rows[i]) * n_cols + cols[j]];
        if (c >= thresh) continue;  // dummy-routed or excluded pair
        out[static_cast<size_t>(rows[i])] = cols[j];
    }
    return out;
}

// ---------------------------------------------------------------------
// Full (max-cardinality, min-cost) assignment over valid pairs —
// lap.lapjv(extend_cost=True) semantics without a cost limit (mirrors
// boxmot_tpu/trackers/ocsort.py _full_assignment).  Returns r2c of size
// n_rows: det column per slot row or -1.
// ---------------------------------------------------------------------
inline std::vector<int32_t> full_assignment(
    const std::vector<double>& cost, int64_t n_rows, int64_t n_cols,
    const std::vector<char>& row_mask, const std::vector<char>& col_mask) {
    std::vector<int32_t> out(static_cast<size_t>(n_rows), -1);
    std::vector<int32_t> rows, cols;
    for (int64_t i = 0; i < n_rows; ++i)
        if (row_mask[static_cast<size_t>(i)]) rows.push_back(static_cast<int32_t>(i));
    for (int64_t j = 0; j < n_cols; ++j)
        if (col_mask[static_cast<size_t>(j)]) cols.push_back(static_cast<int32_t>(j));
    if (rows.empty() || cols.empty()) return out;
    const int64_t n = static_cast<int64_t>(rows.size());
    const int64_t m = static_cast<int64_t>(cols.size());
    std::vector<double> sub(static_cast<size_t>(n * m));
    double maxc = 0.0;
    for (int64_t i = 0; i < n; ++i)
        for (int64_t j = 0; j < m; ++j) {
            double c = cost[static_cast<size_t>(rows[i]) * n_cols + cols[j]];
            sub[static_cast<size_t>(i * m + j)] = c;
            maxc = std::max(maxc, std::abs(c));
        }
    // every real pair is cheaper than routing both endpoints to dummies
    const double limit = 2.0 * maxc + 2.0;
    std::vector<int32_t> r2c(static_cast<size_t>(n), -1);
    if (bmt_lapjv(sub.data(), n, m, limit, r2c.data()) != 0) return out;
    for (int64_t i = 0; i < n; ++i)
        if (r2c[i] >= 0) out[static_cast<size_t>(rows[i])] = cols[r2c[i]];
    return out;
}

}  // namespace boxmot

#endif  // BOXMOT_SLOT_COMMON_HPP
