// SFSORT as a fixed-capacity slot bank on the CPU.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/sfsort.py (sfsort_step): Kalman-free track state
// (last matched box), BBSI cost for the high-confidence pass, plain IoU
// for the intermediate pass, Central/Marginal lost states with separate
// timeouts, and the reference's quirks (swapped w/h intersection naming,
// pass-2 gated on high detections existing, ids starting at 0).
// Reference: boxmot/trackers/bbox/sfsort/sfsort.py:18-630.  AABB only.

#ifndef BOXMOT_SFSORT_BANK_HPP
#define BOXMOT_SFSORT_BANK_HPP

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "obb_common.hpp"
#include "slot_common.hpp"

namespace boxmot {

struct SFSortConfig {
    float high_th = 0.6f;
    float match_th_first = 0.67f;
    float new_track_th = 0.7f;
    float low_th = 0.1f;
    float match_th_second = 0.3f;
    bool dynamic_tuning = false;
    float cth = 0.5f;
    float high_th_m = 0.0f;
    float new_track_th_m = 0.0f;
    float match_th_first_m = 0.0f;
    int marginal_timeout = 0;
    int central_timeout = 0;
    // margins [l, r, t, b]; open by default (no frame size known)
    float margin_l = 0.0f, margin_r = 1e9f, margin_t = 0.0f, margin_b = 1e9f;
    float obb_theta_damping = 0.8f;
    int capacity = 256;

    static SFSortConfig from_string(const char* s) {
        auto kv = parse_config(s);
        SFSortConfig c;
        auto clampf = [](double v, double lo, double hi) {
            return static_cast<float>(std::max(lo, std::min(v, hi)));
        };
        // clamping mirrors the host wrapper (SFSORT.__init__)
        c.high_th = clampf(cfg_get(kv, "high_th", c.high_th), 0.0, 1.0);
        c.match_th_first = clampf(cfg_get(kv, "match_th_first", c.match_th_first), 0.0, 0.67);
        c.new_track_th = clampf(cfg_get(kv, "new_track_th", c.new_track_th), c.high_th, 1.0);
        c.low_th = clampf(cfg_get(kv, "low_th", c.low_th), 0.0, c.high_th);
        c.match_th_second = clampf(cfg_get(kv, "match_th_second", c.match_th_second), 0.0, 1.0);
        c.dynamic_tuning = cfg_get(kv, "dynamic_tuning", 0.0) != 0.0;
        c.cth = clampf(cfg_get(kv, "cth", c.cth), c.low_th, 1.0);
        c.high_th_m = static_cast<float>(cfg_get(kv, "high_th_m", c.high_th_m));
        c.new_track_th_m = static_cast<float>(cfg_get(kv, "new_track_th_m", c.new_track_th_m));
        c.match_th_first_m =
            static_cast<float>(cfg_get(kv, "match_th_first_m", c.match_th_first_m));
        if (c.dynamic_tuning) {
            c.high_th_m = clampf(c.high_th_m, 0.02, 0.1);
            c.new_track_th_m = clampf(c.new_track_th_m, 0.02, 0.08);
            c.match_th_first_m = clampf(c.match_th_first_m, 0.02, 0.08);
        }
        c.marginal_timeout =
            static_cast<int>(clampf(cfg_get(kv, "marginal_timeout", c.marginal_timeout), 0, 500));
        c.central_timeout =
            static_cast<int>(clampf(cfg_get(kv, "central_timeout", c.central_timeout), 0, 1000));
        double fw = cfg_get(kv, "frame_width", -1.0);
        double fh = cfg_get(kv, "frame_height", -1.0);
        if (fw > 0 && fh > 0) {
            double hm = cfg_get(kv, "horizontal_margin", -1.0);
            double vm = cfg_get(kv, "vertical_margin", -1.0);
            c.margin_l = 0.0f;
            c.margin_r = static_cast<float>(fw);
            c.margin_t = 0.0f;
            c.margin_b = static_cast<float>(fh);
            if (hm >= 0) {
                c.margin_l = clampf(hm, 0.0, fw);
                c.margin_r = clampf(fw - hm, 0.0, fw);
            }
            if (vm >= 0) {
                c.margin_t = clampf(vm, 0.0, fh);
                c.margin_b = clampf(fh - vm, 0.0, fh);
            }
        }
        c.obb_theta_damping =
            clampf(cfg_get(kv, "obb_theta_damping", c.obb_theta_damping), 0.0, 1.0);
        c.capacity = static_cast<int>(cfg_get(kv, "capacity", c.capacity));
        return c;
    }
};

class SFSortCore {
  public:
    enum Status : int32_t { kActive = 0, kLostCentral = 1, kLostMarginal = 2, kFree = 3 };

    explicit SFSortCore(const SFSortConfig& cfg) : cfg_(cfg) { reset(); }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
        bbox_.assign(K * 4, 0.0f);
        status_.assign(K, kFree);
        tid_.assign(K, 0);
        conf_.assign(K, 0.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        last_frame_.assign(K, 0);
        frame_count_ = 0;
        next_id_ = 0;  // reference ids start at 0 (sfsort.py:18-27)
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        const int K = cfg_.capacity;
        const int32_t frame = ++frame_count_;

        // dynamic thresholds (sfsort.py:395-407)
        float hth = cfg_.high_th, nth = cfg_.new_track_th, mth = cfg_.match_th_first;
        if (cfg_.dynamic_tuning) {
            int count = 0;
            for (int64_t j = 0; j < n; ++j)
                if (dets[j * 6 + 4] > cfg_.cth) ++count;
            float lnc = std::log10(static_cast<float>(std::max(count, 1)));
            hth = std::min(std::max(cfg_.high_th - cfg_.high_th_m * lnc, 0.0f), 1.0f);
            nth = std::min(std::max(cfg_.new_track_th + cfg_.new_track_th_m * lnc, hth), 1.0f);
            mth = std::min(std::max(cfg_.match_th_first - cfg_.match_th_first_m * lnc, 0.0f),
                           0.67f);
        }

        // purge stale lost tracks (sfsort.py:409-416)
        for (int i = 0; i < K; ++i) {
            int32_t age = frame - last_frame_[i];
            if (status_[i] == kLostCentral && age > cfg_.central_timeout) status_[i] = kFree;
            if (status_[i] == kLostMarginal && age > cfg_.marginal_timeout) status_[i] = kFree;
        }

        std::vector<char> pool(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) pool[i] = status_[i] != kFree;
        std::vector<char> high(static_cast<size_t>(n), 0), inter(static_cast<size_t>(n), 0);
        bool any_high = false, any_inter = false;
        for (int64_t j = 0; j < n; ++j) {
            float c = dets[j * 6 + 4];
            high[static_cast<size_t>(j)] = c > hth;
            inter[static_cast<size_t>(j)] = (c > cfg_.low_th) && (c < hth);
            any_high |= high[static_cast<size_t>(j)] != 0;
            any_inter |= inter[static_cast<size_t>(j)] != 0;
        }

        // pass 1: BBSI cost, cost_limit = mth
        std::vector<double> cost1(static_cast<size_t>(K) * static_cast<size_t>(n), 1e9);
        for (int i = 0; i < K; ++i) {
            if (!pool[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                cost1[static_cast<size_t>(i) * n + j] =
                    bbsi(&bbox_[static_cast<size_t>(i) * 4], &dets[j * 6]);
        }
        std::vector<int32_t> r2c1 = masked_assignment(cost1, K, n, pool, high, mth);
        std::vector<char> matched(static_cast<size_t>(K), 0), dm1(static_cast<size_t>(n), 0);
        std::vector<int32_t> det_col(static_cast<size_t>(K), -1);
        for (int i = 0; i < K; ++i) {
            if (r2c1[i] < 0 || !any_high) continue;
            matched[i] = 1;
            det_col[i] = r2c1[i];
            dm1[static_cast<size_t>(r2c1[i])] = 1;
        }

        // pass 2: intermediate dets vs pass-1 unmatched pool, IoU — only
        // when high detections existed (sfsort.py:352-361)
        if (any_high && any_inter) {
            std::vector<char> u_pool(static_cast<size_t>(K), 0);
            for (int i = 0; i < K; ++i) u_pool[i] = pool[i] && !matched[i];
            std::vector<double> cost2(static_cast<size_t>(K) * static_cast<size_t>(n), 1e9);
            for (int i = 0; i < K; ++i) {
                if (!u_pool[i]) continue;
                for (int64_t j = 0; j < n; ++j)
                    cost2[static_cast<size_t>(i) * n + j] =
                        1.0 - iou_xyxy(&bbox_[static_cast<size_t>(i) * 4], &dets[j * 6]);
            }
            std::vector<int32_t> r2c2 =
                masked_assignment(cost2, K, n, u_pool, inter, cfg_.match_th_second);
            for (int i = 0; i < K; ++i) {
                if (r2c2[i] < 0) continue;
                matched[i] = 1;
                det_col[i] = r2c2[i];
            }
        }

        // matched updates: state = det box
        for (int i = 0; i < K; ++i) {
            int32_t j = det_col[i];
            if (j < 0) continue;
            std::copy(&dets[static_cast<int64_t>(j) * 6], &dets[static_cast<int64_t>(j) * 6 + 4],
                      &bbox_[static_cast<size_t>(i) * 4]);
            conf_[i] = dets[static_cast<int64_t>(j) * 6 + 4];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            last_frame_[i] = frame;
            status_[i] = kActive;
        }

        // unmatched pool -> lost with central/marginal split, or dropped
        // when only intermediate dets existed (sfsort.py:352-361,417-427)
        for (int i = 0; i < K; ++i) {
            if (!pool[i] || matched[i]) continue;
            bool goes_lost = any_high || !any_inter;
            bool already_lost = status_[i] == kLostCentral || status_[i] == kLostMarginal;
            if (goes_lost) {
                if (!already_lost) {
                    const float* b = &bbox_[static_cast<size_t>(i) * 4];
                    float u = (b[0] + b[2]) / 2.0f;
                    float v = (b[1] + b[3]) / 2.0f;
                    bool central = cfg_.margin_l < u && u < cfg_.margin_r &&
                                   cfg_.margin_t < v && v < cfg_.margin_b;
                    status_[i] = central ? kLostCentral : kLostMarginal;
                }
            } else if (status_[i] == kActive) {
                status_[i] = kFree;
            }
        }

        // new tracks from unmatched high dets above nth; ids from 0
        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!high[static_cast<size_t>(j)] || dm1[static_cast<size_t>(j)]) continue;
            if (dets[j * 6 + 4] <= nth) continue;
            while (free_cursor < K && status_[free_cursor] != kFree) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            std::copy(&dets[j * 6], &dets[j * 6 + 4], &bbox_[static_cast<size_t>(i) * 4]);
            status_[i] = kActive;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * 6 + 4];
            cls_[i] = dets[j * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            last_frame_[i] = frame;
        }

        // output: active tracks touched this frame
        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (status_[i] != kActive || last_frame_[i] != frame) continue;
            float* row = out + m_out * 8;
            std::copy(&bbox_[static_cast<size_t>(i) * 4], &bbox_[static_cast<size_t>(i) * 4 + 4], row);
            row[4] = static_cast<float>(tid_[i]);
            row[5] = conf_[i];
            row[6] = cls_[i];
            row[7] = det_ind_[i];
            ++m_out;
        }
        return m_out;
    }

    int capacity() const { return cfg_.capacity; }
    // id the next created track will carry in the output rows
    int64_t next_track_id() const { return next_id_; }

  private:
    // BBSI cost replicating the reference math verbatim, including the
    // swapped w/h intersection naming (sfsort.py:553-630)
    static double bbsi(const float* t, const float* d) {
        const float eps = 1e-7f;
        float h_inter = std::max(0.0f, std::min(t[2], d[2]) - std::max(t[0], d[0]));
        float w_inter = std::max(0.0f, std::min(t[3], d[3]) - std::max(t[1], d[1]));
        float inter = h_inter * w_inter;
        float t_h = t[2] - t[0], d_h = d[2] - d[0];  // "height" along x
        float t_w = t[3] - t[1], d_w = d[3] - d[1];
        float uni = d_h * d_w + t_h * t_w - inter + eps;
        float iou = inter / uni;
        float cx1 = (t[0] + t[2]) / 2.0f, cy1 = (t[1] + t[3]) / 2.0f;
        float cx2 = (d[0] + d[2]) / 2.0f, cy2 = (d[1] + d[3]) / 2.0f;
        float sw = w_inter / std::abs(w_inter + std::abs(d_w - t_w) + eps);
        float sh = h_inter / std::abs(h_inter + std::abs(d_h - t_h) + eps);
        float inner = std::abs(cx1 - cx2) + std::abs(cy1 - cy2);
        float outer = std::max(
            std::abs(std::max(t[2], d[2]) - std::min(t[0], d[0])) +
                std::abs(std::max(t[3], d[3]) - std::min(t[1], d[1])),
            eps);
        float diou = iou - inner / outer;
        return 1.0 - (diou + sh + sw) / 3.0;
    }

    SFSortConfig cfg_;
    std::vector<float> bbox_, conf_, cls_, det_ind_;
    std::vector<int32_t> status_, tid_, last_frame_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 0;
};

// Oriented-box SFSORT (sfsort_step with cfg.is_obb=True): rotated-IoU
// BBSI with min/max width/height ratio terms and L1 diagonals over the
// corner AABB hulls, 4-way OBB measurement alignment on matched
// updates, and the damped theta-velocity smoothing
// (sfsort.py:69-144, 484-552).  Input rows (n, 7) [cx,cy,w,h,angle,
// conf,cls]; output rows (m, 9).
class SFSortObbCore {
  public:
    explicit SFSortObbCore(const SFSortConfig& cfg) : cfg_(cfg) { reset(); }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
        bbox_.assign(K * 5, 0.0f);
        for (size_t i = 0; i < K; ++i) {
            bbox_[i * 5 + 2] = 1.0f;  // unit boxes keep rotated IoU finite
            bbox_[i * 5 + 3] = 1.0f;
        }
        theta_vel_.assign(K, 0.0f);
        status_.assign(K, kFree);
        tid_.assign(K, 0);
        conf_.assign(K, 0.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        last_frame_.assign(K, 0);
        frame_count_ = 0;
        next_id_ = 0;
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        const int K = cfg_.capacity;
        const int DC = 7;
        const int32_t frame = ++frame_count_;

        float hth = cfg_.high_th, nth = cfg_.new_track_th, mth = cfg_.match_th_first;
        if (cfg_.dynamic_tuning) {
            int count = 0;
            for (int64_t j = 0; j < n; ++j)
                if (dets[j * DC + 5] > cfg_.cth) ++count;
            float lnc = std::log10(static_cast<float>(std::max(count, 1)));
            hth = std::min(std::max(cfg_.high_th - cfg_.high_th_m * lnc, 0.0f), 1.0f);
            nth = std::min(std::max(cfg_.new_track_th + cfg_.new_track_th_m * lnc, hth), 1.0f);
            mth = std::min(std::max(cfg_.match_th_first - cfg_.match_th_first_m * lnc, 0.0f),
                           0.67f);
        }

        for (int i = 0; i < K; ++i) {
            int32_t age = frame - last_frame_[i];
            if (status_[i] == kLostCentral && age > cfg_.central_timeout) status_[i] = kFree;
            if (status_[i] == kLostMarginal && age > cfg_.marginal_timeout) status_[i] = kFree;
        }

        std::vector<char> pool(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) pool[i] = status_[i] != kFree;
        std::vector<char> high(static_cast<size_t>(n), 0), inter(static_cast<size_t>(n), 0);
        bool any_high = false, any_inter = false;
        for (int64_t j = 0; j < n; ++j) {
            float c = dets[j * DC + 5];
            high[static_cast<size_t>(j)] = c > hth;
            inter[static_cast<size_t>(j)] = (c > cfg_.low_th) && (c < hth);
            any_high |= high[static_cast<size_t>(j)] != 0;
            any_inter |= inter[static_cast<size_t>(j)] != 0;
        }

        std::vector<double> cost1(static_cast<size_t>(K) * static_cast<size_t>(n), 1e9);
        for (int i = 0; i < K; ++i) {
            if (!pool[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                cost1[static_cast<size_t>(i) * n + j] =
                    bbsi_obb(&bbox_[static_cast<size_t>(i) * 5], &dets[j * DC]);
        }
        std::vector<int32_t> r2c1 = masked_assignment(cost1, K, n, pool, high, mth);
        std::vector<char> matched(static_cast<size_t>(K), 0), dm1(static_cast<size_t>(n), 0);
        std::vector<int32_t> det_col(static_cast<size_t>(K), -1);
        for (int i = 0; i < K; ++i) {
            if (r2c1[i] < 0 || !any_high) continue;
            matched[i] = 1;
            det_col[i] = r2c1[i];
            dm1[static_cast<size_t>(r2c1[i])] = 1;
        }

        if (any_high && any_inter) {
            std::vector<char> u_pool(static_cast<size_t>(K), 0);
            for (int i = 0; i < K; ++i) u_pool[i] = pool[i] && !matched[i];
            std::vector<double> cost2(static_cast<size_t>(K) * static_cast<size_t>(n), 1e9);
            for (int i = 0; i < K; ++i) {
                if (!u_pool[i]) continue;
                for (int64_t j = 0; j < n; ++j)
                    cost2[static_cast<size_t>(i) * n + j] =
                        1.0 - iou_obb(&bbox_[static_cast<size_t>(i) * 5], &dets[j * DC]);
            }
            std::vector<int32_t> r2c2 =
                masked_assignment(cost2, K, n, u_pool, inter, cfg_.match_th_second);
            for (int i = 0; i < K; ++i)
                if (r2c2[i] >= 0) {
                    matched[i] = 1;
                    det_col[i] = r2c2[i];
                }
        }

        // matched update: align, smooth theta with a damped velocity
        for (int i = 0; i < K; ++i) {
            int32_t j = det_col[i];
            if (j < 0) continue;
            float* b = &bbox_[static_cast<size_t>(i) * 5];
            float aligned[5];
            align_obb_to_ref(&dets[static_cast<int64_t>(j) * DC], b, aligned);
            float prev_theta = b[4];
            float delta = wrap_angle(aligned[4] - prev_theta);
            float d = cfg_.obb_theta_damping;
            theta_vel_[i] = d * theta_vel_[i] + (1.0f - d) * delta;
            std::copy(aligned, aligned + 4, b);
            b[4] = wrap_angle(prev_theta + theta_vel_[i]);
            conf_[i] = dets[static_cast<int64_t>(j) * DC + 5];
            cls_[i] = dets[static_cast<int64_t>(j) * DC + 6];
            det_ind_[i] = static_cast<float>(j);
            last_frame_[i] = frame;
            status_[i] = kActive;
        }

        for (int i = 0; i < K; ++i) {
            if (!pool[i] || matched[i]) continue;
            bool goes_lost = any_high || !any_inter;
            bool already_lost = status_[i] == kLostCentral || status_[i] == kLostMarginal;
            if (goes_lost) {
                if (!already_lost) {
                    float u = bbox_[static_cast<size_t>(i) * 5];       // xywha center
                    float v = bbox_[static_cast<size_t>(i) * 5 + 1];
                    bool central = cfg_.margin_l < u && u < cfg_.margin_r &&
                                   cfg_.margin_t < v && v < cfg_.margin_b;
                    status_[i] = central ? kLostCentral : kLostMarginal;
                }
            } else if (status_[i] == kActive) {
                status_[i] = kFree;
            }
        }

        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!high[static_cast<size_t>(j)] || dm1[static_cast<size_t>(j)]) continue;
            if (dets[j * DC + 5] <= nth) continue;
            while (free_cursor < K && status_[free_cursor] != kFree) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            std::copy(&dets[j * DC], &dets[j * DC + 5], &bbox_[static_cast<size_t>(i) * 5]);
            theta_vel_[i] = 0.0f;
            status_[i] = kActive;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * DC + 5];
            cls_[i] = dets[j * DC + 6];
            det_ind_[i] = static_cast<float>(j);
            last_frame_[i] = frame;
        }

        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (status_[i] != kActive || last_frame_[i] != frame) continue;
            float* row = out + m_out * 9;
            std::copy(&bbox_[static_cast<size_t>(i) * 5],
                      &bbox_[static_cast<size_t>(i) * 5 + 5], row);
            row[5] = static_cast<float>(tid_[i]);
            row[6] = conf_[i];
            row[7] = cls_[i];
            row[8] = det_ind_[i];
            ++m_out;
        }
        return m_out;
    }

    int capacity() const { return cfg_.capacity; }
    // id the next created track will carry in the output rows
    int64_t next_track_id() const { return next_id_; }
    int out_cols() const { return 9; }

  private:
    enum Status : int32_t { kActive = 0, kLostCentral = 1, kLostMarginal = 2, kFree = 3 };

    // OBB BBSI (sfsort.py:514-552): rotated IoU + min/max w-h ratio
    // terms + L1 diagonals over corner AABB hulls
    static double bbsi_obb(const float* t, const float* d) {
        const float eps = 1e-7f;
        float iou = iou_obb(t, d);
        float sw = std::min(t[2], d[2]) / (std::max(t[2], d[2]) + eps);
        float sh = std::min(t[3], d[3]) / (std::max(t[3], d[3]) + eps);
        float inner = std::abs(t[0] - d[0]) + std::abs(t[1] - d[1]);
        float tc[4][2], dc[4][2];
        obb_corners(t, tc);
        obb_corners(d, dc);
        float tx1 = 1e30f, ty1 = 1e30f, tx2 = -1e30f, ty2 = -1e30f;
        float dx1 = 1e30f, dy1 = 1e30f, dx2 = -1e30f, dy2 = -1e30f;
        for (int k = 0; k < 4; ++k) {
            tx1 = std::min(tx1, tc[k][0]); ty1 = std::min(ty1, tc[k][1]);
            tx2 = std::max(tx2, tc[k][0]); ty2 = std::max(ty2, tc[k][1]);
            dx1 = std::min(dx1, dc[k][0]); dy1 = std::min(dy1, dc[k][1]);
            dx2 = std::max(dx2, dc[k][0]); dy2 = std::max(dy2, dc[k][1]);
        }
        float outer = std::max(
            std::abs(std::max(tx2, dx2) - std::min(tx1, dx1)) +
                std::abs(std::max(ty2, dy2) - std::min(ty1, dy1)),
            eps);
        float diou = iou - inner / outer;
        return 1.0 - (diou + sh + sw) / 3.0;
    }

    SFSortConfig cfg_;
    std::vector<float> bbox_, theta_vel_, conf_, cls_, det_ind_;
    std::vector<int32_t> status_, tid_, last_frame_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 0;
};

}  // namespace boxmot

#endif  // BOXMOT_SFSORT_BANK_HPP
