// OC-SORT as a fixed-capacity slot bank on the CPU.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/ocsort.py (ocsort_step): XYSR Kalman bank,
// velocity-direction association cost with the unique-candidate
// shortcut, optional BYTE pass, observation-centric recovery, and the
// ORU frozen-state replay over interpolated measurements.  Reference
// semantics documented there (reference:
// boxmot/trackers/bbox/ocsort/ocsort.py:90-556).  AABB + iou asso only,
// matching the reference native core's fixed-iou scope
// (reference docs/native/index.md:31).

#ifndef BOXMOT_OCSORT_BANK_HPP
#define BOXMOT_OCSORT_BANK_HPP

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "kalman_bank.hpp"
#include "obb_common.hpp"
#include "slot_common.hpp"

namespace boxmot {

struct OcSortConfig {
    float det_thresh = 0.3f;
    float min_conf = 0.1f;
    int max_age = 30;
    int min_hits = 3;
    float iou_threshold = 0.3f;
    int delta_t = 3;
    float inertia = 0.2f;
    bool use_byte = false;
    float q_xy_scaling = 0.01f;
    float q_s_scaling = 0.0001f;
    int capacity = 256;

    static OcSortConfig from_string(const char* s) {
        auto kv = parse_config(s);
        OcSortConfig c;
        c.det_thresh = static_cast<float>(cfg_get(kv, "det_thresh", c.det_thresh));
        c.min_conf = static_cast<float>(cfg_get(kv, "min_conf", c.min_conf));
        c.max_age = static_cast<int>(cfg_get(kv, "max_age", c.max_age));
        c.min_hits = static_cast<int>(cfg_get(kv, "min_hits", c.min_hits));
        c.iou_threshold = static_cast<float>(cfg_get(kv, "iou_threshold", c.iou_threshold));
        c.delta_t = static_cast<int>(cfg_get(kv, "delta_t", c.delta_t));
        c.inertia = static_cast<float>(cfg_get(kv, "inertia", c.inertia));
        c.use_byte = cfg_get(kv, "use_byte", 0.0) != 0.0;
        c.q_xy_scaling = static_cast<float>(cfg_get(kv, "q_xy_scaling", c.q_xy_scaling));
        c.q_s_scaling = static_cast<float>(cfg_get(kv, "q_s_scaling", c.q_s_scaling));
        c.capacity = static_cast<int>(cfg_get(kv, "capacity", c.capacity));
        return c;
    }
};

class OcSortCore {
  public:
    static constexpr int DX = 7;

    explicit OcSortCore(const OcSortConfig& cfg) : cfg_(cfg) {
        XysrLayout layout;
        layout.q_xy = cfg.q_xy_scaling;
        layout.q_s = cfg.q_s_scaling;
        kf_ = KalmanBank<XysrLayout>(layout);
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
        const size_t R = static_cast<size_t>(cfg_.delta_t);
        mean_.assign(K * DX, 0.0f);
        cov_.assign(K * DX * DX, 0.0f);
        frozen_mean_.assign(K * DX, 0.0f);
        frozen_cov_.assign(K * DX * DX, 0.0f);
        active_.assign(K, 0);
        age_.assign(K, 0);
        tsu_.assign(K, 0);
        hits_.assign(K, 0);
        hit_streak_.assign(K, 0);
        tid_.assign(K, 0);
        conf_.assign(K, 0.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        last_obs_.assign(K * 5, -1.0f);
        has_obs_.assign(K, 0);
        obs_ring_.assign(K * R * 5, -1.0f);
        ring_age_.assign(K * R, -1);
        velocity_.assign(K * 2, 0.0f);
        observed_.assign(K, 0);
        last_meas_.assign(K * 4, 0.0f);
        frame_count_ = 0;
        next_id_ = 1;
    }

    // dets: (n, 6) [x1,y1,x2,y2,conf,cls].  out: capacity * 8 floats of
    // [x1,y1,x2,y2,id,conf,cls,det_ind]; returns rows written.
    int64_t step(const float* dets, int64_t n, float* out) {
        const int K = cfg_.capacity;
        const int R = cfg_.delta_t;
        const int32_t frame = ++frame_count_;

        std::vector<char> first(static_cast<size_t>(n), 0), second(static_cast<size_t>(n), 0);
        std::vector<float> det_meas(static_cast<size_t>(n) * 4);
        for (int64_t j = 0; j < n; ++j) {
            float c = dets[j * 6 + 4];
            first[static_cast<size_t>(j)] = c > cfg_.det_thresh;
            second[static_cast<size_t>(j)] = (c > cfg_.min_conf) && (c < cfg_.det_thresh);
            xyxy_to_xysr(&dets[j * 6], &det_meas[static_cast<size_t>(j) * 4]);
        }

        // --- predict: zero area-velocity that would drive area negative
        // (KalmanBoxTracker.predict, reference ocsort.py:278-296)
        std::vector<char> prev_observed = observed_, prev_has_obs = has_obs_;
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            float* m = &mean_[static_cast<size_t>(i) * DX];
            if (m[6] + m[2] <= 0.0f) m[6] = 0.0f;
            kf_.predict(m, &cov_[static_cast<size_t>(i) * DX * DX]);
            age_[i] += 1;
            if (tsu_[i] > 0) hit_streak_[i] = 0;
            tsu_[i] += 1;
        }

        // --- k_previous_obs from the ring buffer (reference ocsort.py:18-29)
        std::vector<float> k_obs(static_cast<size_t>(K) * 5);
        for (int i = 0; i < K; ++i) {
            const float* fallback = &last_obs_[static_cast<size_t>(i) * 5];
            const float* chosen = fallback;
            for (int d = 0; d < R; ++d) {
                int dt = R - d;
                int target = age_[i] - dt;
                if (target < 0) continue;
                int slot = target % R;
                if (ring_age_[static_cast<size_t>(i) * R + slot] == target) {
                    chosen = &obs_ring_[(static_cast<size_t>(i) * R + slot) * 5];
                    break;
                }
            }
            for (int c = 0; c < 5; ++c) k_obs[static_cast<size_t>(i) * 5 + c] = chosen[c];
        }

        // --- pass 1: iou + velocity-direction cost over active x first
        std::vector<float> trk_box(static_cast<size_t>(K) * 4);
        for (int i = 0; i < K; ++i)
            xysr_to_xyxy(&mean_[static_cast<size_t>(i) * DX], &trk_box[static_cast<size_t>(i) * 4]);
        std::vector<float> iou1(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
        std::vector<char> active_mask(active_);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                iou1[static_cast<size_t>(i) * n + j] =
                    iou_xyxy(&trk_box[static_cast<size_t>(i) * 4], &dets[j * 6]);
        }

        std::vector<int32_t> r2c1 = associate_pass1(iou1, k_obs, dets, n, active_mask, first);
        std::vector<char> matched(static_cast<size_t>(K), 0);
        std::vector<int32_t> det_col(static_cast<size_t>(K), -1);
        std::vector<char> dm(static_cast<size_t>(n), 0);
        for (int i = 0; i < K; ++i) {
            if (r2c1[i] < 0) continue;
            matched[i] = 1;
            det_col[i] = r2c1[i];
            dm[static_cast<size_t>(r2c1[i])] = 1;
        }

        // --- optional BYTE pass on low-conf dets (reference ocsort.py:455-483)
        if (cfg_.use_byte) {
            std::vector<char> rows2(static_cast<size_t>(K), 0);
            for (int i = 0; i < K; ++i) rows2[i] = active_[i] && !matched[i];
            float best = -1.0f;
            for (int i = 0; i < K; ++i) {
                if (!rows2[i]) continue;
                for (int64_t j = 0; j < n; ++j)
                    if (second[static_cast<size_t>(j)])
                        best = std::max(best, iou1[static_cast<size_t>(i) * n + j]);
            }
            if (best > cfg_.iou_threshold) {
                std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n));
                for (size_t idx = 0; idx < cost.size(); ++idx) cost[idx] = -static_cast<double>(iou1[idx]);
                std::vector<int32_t> r2c2 = full_assignment(cost, K, n, rows2, second);
                for (int i = 0; i < K; ++i) {
                    int32_t j = r2c2[i];
                    if (j < 0 || iou1[static_cast<size_t>(i) * n + j] < cfg_.iou_threshold) continue;
                    matched[i] = 1;
                    det_col[i] = j;
                    dm[static_cast<size_t>(j)] = 1;
                }
            }
        }

        // --- OCR: leftover dets vs last observations (reference ocsort.py:485-510)
        {
            std::vector<char> rows3(static_cast<size_t>(K), 0), cols3(static_cast<size_t>(n), 0);
            for (int i = 0; i < K; ++i) rows3[i] = active_[i] && !matched[i];
            for (int64_t j = 0; j < n; ++j) cols3[static_cast<size_t>(j)] = first[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)];
            std::vector<float> iou3(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
            float best = -1.0f;
            for (int i = 0; i < K; ++i) {
                if (!rows3[i]) continue;
                for (int64_t j = 0; j < n; ++j) {
                    float v = iou_xyxy(&last_obs_[static_cast<size_t>(i) * 5], &dets[j * 6]);
                    iou3[static_cast<size_t>(i) * n + j] = v;
                    if (cols3[static_cast<size_t>(j)]) best = std::max(best, v);
                }
            }
            if (best > cfg_.iou_threshold) {
                std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n));
                for (size_t idx = 0; idx < cost.size(); ++idx) cost[idx] = -static_cast<double>(iou3[idx]);
                std::vector<int32_t> r2c3 = full_assignment(cost, K, n, rows3, cols3);
                for (int i = 0; i < K; ++i) {
                    int32_t j = r2c3[i];
                    if (j < 0 || iou3[static_cast<size_t>(i) * n + j] < cfg_.iou_threshold) continue;
                    matched[i] = 1;
                    det_col[i] = j;
                    dm[static_cast<size_t>(j)] = 1;
                }
            }
        }

        // --- ORU replay + regular update for matched slots
        for (int i = 0; i < K; ++i) {
            if (!matched[i]) continue;
            int32_t j = det_col[i];
            const float* z2 = &det_meas[static_cast<size_t>(j) * 4];
            float* m = &mean_[static_cast<size_t>(i) * DX];
            float* P = &cov_[static_cast<size_t>(i) * DX * DX];
            bool rejoin = !prev_observed[i] && prev_has_obs[i] && tsu_[i] > 1;
            if (rejoin) {
                // restore the frozen pre-miss state and replay interpolated
                // measurements (xysr freeze/unfreeze, reference xysr.py:379-440)
                std::memcpy(m, &frozen_mean_[static_cast<size_t>(i) * DX], sizeof(float) * DX);
                std::memcpy(P, &frozen_cov_[static_cast<size_t>(i) * DX * DX],
                            sizeof(float) * DX * DX);
                const float* m1 = &last_meas_[static_cast<size_t>(i) * 4];
                int gap = tsu_[i];
                float w1 = std::sqrt(std::max(m1[2] * m1[3], 1e-12f));
                float h1 = std::sqrt(std::max(m1[2] / std::max(m1[3], 1e-12f), 1e-12f));
                float w2 = std::sqrt(std::max(z2[2] * z2[3], 1e-12f));
                float h2 = std::sqrt(std::max(z2[2] / std::max(z2[3], 1e-12f), 1e-12f));
                float gapf = std::max(static_cast<float>(gap), 1.0f);
                float dx = (z2[0] - m1[0]) / gapf;
                float dy = (z2[1] - m1[1]) / gapf;
                float dw = (w2 - w1) / gapf;
                float dh = (h2 - h1) / gapf;
                for (int s = 1; s <= gap; ++s) {
                    if (s > 1) kf_.predict(m, P);
                    float fs = static_cast<float>(s);
                    float wi = w1 + fs * dw;
                    float hi = h1 + fs * dh;
                    float zi[4] = {m1[0] + fs * dx, m1[1] + fs * dy,
                                   std::max(wi * hi, 1e-6f),
                                   std::max(wi / std::max(hi, 1e-12f), 1e-6f)};
                    kf_.update(m, P, zi);
                }
            }
            kf_.update(m, P, z2);

            // velocity toward the new observation from k_previous_obs
            if (prev_has_obs[i]) {
                const float* ko = &k_obs[static_cast<size_t>(i) * 5];
                float fcx = (ko[0] + ko[2]) / 2.0f, fcy = (ko[1] + ko[3]) / 2.0f;
                float tcx = (dets[static_cast<int64_t>(j) * 6 + 0] + dets[static_cast<int64_t>(j) * 6 + 2]) / 2.0f;
                float tcy = (dets[static_cast<int64_t>(j) * 6 + 1] + dets[static_cast<int64_t>(j) * 6 + 3]) / 2.0f;
                float ddx = tcx - fcx, ddy = tcy - fcy;
                float norm = std::sqrt(ddx * ddx + ddy * ddy) + 1e-6f;
                velocity_[static_cast<size_t>(i) * 2 + 0] = ddy / norm;
                velocity_[static_cast<size_t>(i) * 2 + 1] = ddx / norm;
            }

            // observation bookkeeping
            float obs[5] = {dets[static_cast<int64_t>(j) * 6 + 0], dets[static_cast<int64_t>(j) * 6 + 1],
                            dets[static_cast<int64_t>(j) * 6 + 2], dets[static_cast<int64_t>(j) * 6 + 3],
                            dets[static_cast<int64_t>(j) * 6 + 4]};
            std::memcpy(&last_obs_[static_cast<size_t>(i) * 5], obs, sizeof(obs));
            int slot = age_[i] % R;
            std::memcpy(&obs_ring_[(static_cast<size_t>(i) * R + slot) * 5], obs, sizeof(obs));
            ring_age_[static_cast<size_t>(i) * R + slot] = age_[i];
            std::memcpy(&last_meas_[static_cast<size_t>(i) * 4], z2, sizeof(float) * 4);
            has_obs_[i] = 1;
            hits_[i] += 1;
            hit_streak_[i] += 1;
            conf_[i] = dets[static_cast<int64_t>(j) * 6 + 4];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            tsu_[i] = 0;
        }

        // --- misses: freeze on the first unobserved step (xysr.py:452-459)
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            if (!matched[i] && prev_observed[i]) {
                std::memcpy(&frozen_mean_[static_cast<size_t>(i) * DX],
                            &mean_[static_cast<size_t>(i) * DX], sizeof(float) * DX);
                std::memcpy(&frozen_cov_[static_cast<size_t>(i) * DX * DX],
                            &cov_[static_cast<size_t>(i) * DX * DX],
                            sizeof(float) * DX * DX);
            }
            observed_[i] = matched[i];
        }

        // --- new tracks from unmatched high-conf dets, det order onto
        // free slots in slot order (reference ocsort.py:513-526)
        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!first[static_cast<size_t>(j)] || dm[static_cast<size_t>(j)]) continue;
            while (free_cursor < K && active_[free_cursor]) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            kf_.initiate(&det_meas[static_cast<size_t>(j) * 4],
                         &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            active_[i] = 1;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * 6 + 4];
            cls_[i] = dets[j * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            age_[i] = 0;
            tsu_[i] = 0;
            hits_[i] = 0;
            hit_streak_[i] = 0;
            has_obs_[i] = 0;
            observed_[i] = 0;
            velocity_[static_cast<size_t>(i) * 2 + 0] = 0.0f;
            velocity_[static_cast<size_t>(i) * 2 + 1] = 0.0f;
            for (int c = 0; c < 5; ++c) last_obs_[static_cast<size_t>(i) * 5 + c] = -1.0f;
            for (int r = 0; r < R; ++r) ring_age_[static_cast<size_t>(i) * R + r] = -1;
        }

        // --- removal + output (reference ocsort.py:527-550)
        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (active_[i] && tsu_[i] > cfg_.max_age) active_[i] = 0;
            if (!active_[i] || tsu_[i] >= 1) continue;
            if (hit_streak_[i] < cfg_.min_hits && frame > cfg_.min_hits) continue;
            float* row = out + m_out * 8;
            if (has_obs_[i]) {
                std::memcpy(row, &last_obs_[static_cast<size_t>(i) * 5], sizeof(float) * 4);
            } else {
                xysr_to_xyxy(&mean_[static_cast<size_t>(i) * DX], row);
            }
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
    // pass-1 association with the unique-candidate shortcut
    // (reference association.py:61-153)
    std::vector<int32_t> associate_pass1(const std::vector<float>& iou1,
                                         const std::vector<float>& k_obs,
                                         const float* dets, int64_t n,
                                         const std::vector<char>& rows,
                                         const std::vector<char>& cols) const {
        const int K = cfg_.capacity;
        std::vector<int32_t> result(static_cast<size_t>(K), -1);
        // unique shortcut: candidates at iou > threshold form a perfect
        // partial matching
        std::vector<int> row_cnt(static_cast<size_t>(K), 0), col_cnt(static_cast<size_t>(n), 0);
        std::vector<int32_t> row_cand(static_cast<size_t>(K), -1);
        for (int i = 0; i < K; ++i) {
            if (!rows[i]) continue;
            for (int64_t j = 0; j < n; ++j) {
                if (!cols[static_cast<size_t>(j)]) continue;
                if (iou1[static_cast<size_t>(i) * n + j] > cfg_.iou_threshold) {
                    row_cnt[i] += 1;
                    col_cnt[static_cast<size_t>(j)] += 1;
                    row_cand[i] = static_cast<int32_t>(j);
                }
            }
        }
        int max_row = 0, max_col = 0;
        for (int i = 0; i < K; ++i) max_row = std::max(max_row, row_cnt[i]);
        for (int64_t j = 0; j < n; ++j) max_col = std::max(max_col, col_cnt[static_cast<size_t>(j)]);
        if (max_row == 1 && max_col == 1) {
            for (int i = 0; i < K; ++i)
                if (row_cnt[i] == 1) result[i] = row_cand[i];
            return result;
        }
        // full assignment on -(iou + angle_cost), then iou >= threshold gate
        std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0);
        for (int i = 0; i < K; ++i) {
            if (!rows[i]) continue;
            const float* ko = &k_obs[static_cast<size_t>(i) * 5];
            float vy = velocity_[static_cast<size_t>(i) * 2 + 0];
            float vx = velocity_[static_cast<size_t>(i) * 2 + 1];
            bool valid_vel = ko[4] >= 0.0f;
            float fcx = (ko[0] + ko[2]) / 2.0f, fcy = (ko[1] + ko[3]) / 2.0f;
            for (int64_t j = 0; j < n; ++j) {
                float angle_cost = 0.0f;
                if (valid_vel) {
                    float tcx = (dets[j * 6 + 0] + dets[j * 6 + 2]) / 2.0f;
                    float tcy = (dets[j * 6 + 1] + dets[j * 6 + 3]) / 2.0f;
                    float ddx = tcx - fcx, ddy = tcy - fcy;
                    float norm = std::sqrt(ddx * ddx + ddy * ddy) + 1e-6f;
                    float cosv = std::min(1.0f, std::max(-1.0f, vx * (ddx / norm) + vy * (ddy / norm)));
                    float diff_angle =
                        (static_cast<float>(M_PI) / 2.0f - std::abs(std::acos(cosv))) /
                        static_cast<float>(M_PI);
                    angle_cost = diff_angle * cfg_.inertia * dets[j * 6 + 4];
                }
                cost[static_cast<size_t>(i) * n + j] =
                    -(static_cast<double>(iou1[static_cast<size_t>(i) * n + j]) + angle_cost);
            }
        }
        std::vector<int32_t> r2c = full_assignment(cost, K, n, rows, cols);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c[i];
            if (j >= 0 && iou1[static_cast<size_t>(i) * n + j] >= cfg_.iou_threshold)
                result[i] = j;
        }
        return result;
    }

    static void xyxy_to_xysr(const float* b, float* z) {
        float w = b[2] - b[0];
        float h = b[3] - b[1];
        z[0] = b[0] + w / 2.0f;
        z[1] = b[1] + h / 2.0f;
        z[2] = std::max(w * h, 1e-6f);
        z[3] = std::max(w / (h + 1e-6f), 1e-6f);
    }

    static void xysr_to_xyxy(const float* s, float* box) {
        float w = std::sqrt(std::max(s[2] * s[3], 0.0f));
        float h = s[2] / std::max(w, 1e-12f);
        box[0] = s[0] - w / 2.0f;
        box[1] = s[1] - h / 2.0f;
        box[2] = s[0] + w / 2.0f;
        box[3] = s[1] + h / 2.0f;
    }

    OcSortConfig cfg_;
    KalmanBank<XysrLayout> kf_{XysrLayout()};
    std::vector<float> mean_, cov_, frozen_mean_, frozen_cov_;
    std::vector<float> conf_, cls_, det_ind_, last_obs_, obs_ring_, velocity_, last_meas_;
    std::vector<int32_t> age_, tsu_, hits_, hit_streak_, tid_, ring_age_;
    std::vector<char> active_, has_obs_, observed_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

// Oriented-box OC-SORT (ocsort_step with cfg.is_obb=True): the 9-D
// XYSR+theta filter, rotated IoU, OBB measurement alignment at update
// entry and inside the ORU replay, true-center per-track velocities,
// and the reference's speed-direction quirks replicated verbatim
// (the batch cost treats the first 4 xywha columns as xyxy, and
// k_obs column 4 — theta here — gates the velocity term).  Input rows
// (n, 8 - 1 = 7): [cx, cy, w, h, angle, conf, cls]; output (m, 9).
class OcSortObbCore {
  public:
    static constexpr int DX = 9;

    explicit OcSortObbCore(const OcSortConfig& cfg) : cfg_(cfg) {
        XysrObbLayout layout;
        layout.q_xy = cfg.q_xy_scaling;
        layout.q_s = cfg.q_s_scaling;
        kf_ = KalmanBank<XysrObbLayout>(layout);
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
        const size_t R = static_cast<size_t>(cfg_.delta_t);
        mean_.assign(K * DX, 0.0f);
        cov_.assign(K * DX * DX, 0.0f);
        frozen_mean_.assign(K * DX, 0.0f);
        frozen_cov_.assign(K * DX * DX, 0.0f);
        active_.assign(K, 0);
        age_.assign(K, 0);
        tsu_.assign(K, 0);
        hits_.assign(K, 0);
        hit_streak_.assign(K, 0);
        tid_.assign(K, 0);
        conf_.assign(K, 0.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        last_obs_.assign(K * 6, -1.0f);
        has_obs_.assign(K, 0);
        obs_ring_.assign(K * R * 6, -1.0f);
        ring_age_.assign(K * R, -1);
        velocity_.assign(K * 2, 0.0f);
        observed_.assign(K, 0);
        last_meas_.assign(K * 5, 0.0f);
        frame_count_ = 0;
        next_id_ = 1;
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        const int K = cfg_.capacity;
        const int R = cfg_.delta_t;
        const int DC = 7;
        const int32_t frame = ++frame_count_;

        std::vector<char> first(static_cast<size_t>(n), 0), second(static_cast<size_t>(n), 0);
        std::vector<float> det_meas(static_cast<size_t>(n) * 5);
        for (int64_t j = 0; j < n; ++j) {
            float c = dets[j * DC + 5];
            first[static_cast<size_t>(j)] = c > cfg_.det_thresh;
            second[static_cast<size_t>(j)] = (c > cfg_.min_conf) && (c < cfg_.det_thresh);
            obb_to_xysr(&dets[j * DC], &det_meas[static_cast<size_t>(j) * 5]);
        }

        std::vector<char> prev_observed = observed_, prev_has_obs = has_obs_;
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            float* m = &mean_[static_cast<size_t>(i) * DX];
            if (m[7] + m[2] <= 0.0f) m[7] = 0.0f;  // area-velocity guard
            kf_.predict(m, &cov_[static_cast<size_t>(i) * DX * DX]);
            age_[i] += 1;
            if (tsu_[i] > 0) hit_streak_[i] = 0;
            tsu_[i] += 1;
        }

        // k_previous_obs from the ring buffer
        std::vector<float> k_obs(static_cast<size_t>(K) * 6);
        for (int i = 0; i < K; ++i) {
            const float* chosen = &last_obs_[static_cast<size_t>(i) * 6];
            for (int d = 0; d < R; ++d) {
                int target = age_[i] - (R - d);
                if (target < 0) continue;
                int slot = target % R;
                if (ring_age_[static_cast<size_t>(i) * R + slot] == target) {
                    chosen = &obs_ring_[(static_cast<size_t>(i) * R + slot) * 6];
                    break;
                }
            }
            std::memcpy(&k_obs[static_cast<size_t>(i) * 6], chosen, sizeof(float) * 6);
        }

        // pass 1: rotated IoU + velocity-direction cost
        std::vector<float> trk_box(static_cast<size_t>(K) * 5);
        for (int i = 0; i < K; ++i)
            xysr_to_obb(&mean_[static_cast<size_t>(i) * DX], &trk_box[static_cast<size_t>(i) * 5]);
        std::vector<float> iou1(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                iou1[static_cast<size_t>(i) * n + j] =
                    iou_obb(&trk_box[static_cast<size_t>(i) * 5], &dets[j * DC]);
        }

        std::vector<int32_t> r2c1 = associate_pass1(iou1, k_obs, dets, n, first);
        std::vector<char> matched(static_cast<size_t>(K), 0);
        std::vector<int32_t> det_col(static_cast<size_t>(K), -1);
        std::vector<char> dm(static_cast<size_t>(n), 0);
        for (int i = 0; i < K; ++i) {
            if (r2c1[i] < 0) continue;
            matched[i] = 1;
            det_col[i] = r2c1[i];
            dm[static_cast<size_t>(r2c1[i])] = 1;
        }

        // BYTE pass (low-conf, rotated IoU)
        if (cfg_.use_byte) {
            std::vector<char> rows2(static_cast<size_t>(K), 0);
            for (int i = 0; i < K; ++i) rows2[i] = active_[i] && !matched[i];
            float best = -1.0f;
            for (int i = 0; i < K; ++i)
                if (rows2[i])
                    for (int64_t j = 0; j < n; ++j)
                        if (second[static_cast<size_t>(j)])
                            best = std::max(best, iou1[static_cast<size_t>(i) * n + j]);
            if (best > cfg_.iou_threshold) {
                std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n));
                for (size_t idx = 0; idx < cost.size(); ++idx)
                    cost[idx] = -static_cast<double>(iou1[idx]);
                std::vector<int32_t> r2c2 = full_assignment(cost, K, n, rows2, second);
                for (int i = 0; i < K; ++i) {
                    int32_t j = r2c2[i];
                    if (j < 0 || iou1[static_cast<size_t>(i) * n + j] < cfg_.iou_threshold)
                        continue;
                    matched[i] = 1;
                    det_col[i] = j;
                    dm[static_cast<size_t>(j)] = 1;
                }
            }
        }

        // OCR vs last observations (rotated IoU)
        {
            std::vector<char> rows3(static_cast<size_t>(K), 0), cols3(static_cast<size_t>(n), 0);
            for (int i = 0; i < K; ++i) rows3[i] = active_[i] && !matched[i];
            for (int64_t j = 0; j < n; ++j)
                cols3[static_cast<size_t>(j)] =
                    first[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)];
            std::vector<float> iou3(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
            float best = -1.0f;
            for (int i = 0; i < K; ++i) {
                if (!rows3[i]) continue;
                for (int64_t j = 0; j < n; ++j) {
                    float v = iou_obb(&last_obs_[static_cast<size_t>(i) * 6], &dets[j * DC]);
                    iou3[static_cast<size_t>(i) * n + j] = v;
                    if (cols3[static_cast<size_t>(j)]) best = std::max(best, v);
                }
            }
            if (best > cfg_.iou_threshold) {
                std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n));
                for (size_t idx = 0; idx < cost.size(); ++idx)
                    cost[idx] = -static_cast<double>(iou3[idx]);
                std::vector<int32_t> r2c3 = full_assignment(cost, K, n, rows3, cols3);
                for (int i = 0; i < K; ++i) {
                    int32_t j = r2c3[i];
                    if (j < 0 || iou3[static_cast<size_t>(i) * n + j] < cfg_.iou_threshold)
                        continue;
                    matched[i] = 1;
                    det_col[i] = j;
                    dm[static_cast<size_t>(j)] = 1;
                }
            }
        }

        // ORU replay + regular update
        for (int i = 0; i < K; ++i) {
            if (!matched[i]) continue;
            int32_t j = det_col[i];
            float* m = &mean_[static_cast<size_t>(i) * DX];
            float* P = &cov_[static_cast<size_t>(i) * DX * DX];
            // the measurement aligns against the POST-PREDICT state
            // before any frozen restore (ocsort_step z2 alignment)
            float z2[5];
            align_obb_xysr(&det_meas[static_cast<size_t>(j) * 5], m, z2);
            bool rejoin = !prev_observed[i] && prev_has_obs[i] && tsu_[i] > 1;
            if (rejoin) {
                std::memcpy(m, &frozen_mean_[static_cast<size_t>(i) * DX],
                            sizeof(float) * DX);
                std::memcpy(P, &frozen_cov_[static_cast<size_t>(i) * DX * DX],
                            sizeof(float) * DX * DX);
                const float* m1 = &last_meas_[static_cast<size_t>(i) * 5];
                int gap = tsu_[i];
                float w1 = std::sqrt(std::max(m1[2] * m1[3], 1e-12f));
                float h1 = std::sqrt(std::max(m1[2] / std::max(m1[3], 1e-12f), 1e-12f));
                float w2 = std::sqrt(std::max(z2[2] * z2[3], 1e-12f));
                float h2 = std::sqrt(std::max(z2[2] / std::max(z2[3], 1e-12f), 1e-12f));
                float gapf = std::max(static_cast<float>(gap), 1.0f);
                float dx = (z2[0] - m1[0]) / gapf;
                float dy = (z2[1] - m1[1]) / gapf;
                float dw = (w2 - w1) / gapf;
                float dh = (h2 - h1) / gapf;
                float t1 = m1[4];
                float dth = wrap_angle(z2[4] - t1) / gapf;
                for (int s = 1; s <= gap; ++s) {
                    if (s > 1) kf_.predict(m, P);
                    float fs = static_cast<float>(s);
                    float wi = w1 + fs * dw;
                    float hi = h1 + fs * dh;
                    float raw[5] = {m1[0] + fs * dx, m1[1] + fs * dy,
                                    std::max(wi * hi, 1e-6f),
                                    std::max(wi / std::max(hi, 1e-12f), 1e-6f),
                                    wrap_angle(t1 + fs * dth)};
                    float zi[5];
                    align_obb_xysr(raw, m, zi);  // re-align vs the replay state
                    kf_.update(m, P, zi);
                    m[8] *= 0.8f;  // angular velocity damping
                }
            }
            kf_.update(m, P, z2);
            m[8] *= 0.8f;

            // per-track velocity uses TRUE centers in OBB mode
            // (speed_direction_obb, reference ocsort.py:82-88)
            if (prev_has_obs[i]) {
                const float* ko = &k_obs[static_cast<size_t>(i) * 6];
                float ddx = dets[static_cast<int64_t>(j) * DC + 0] - ko[0];
                float ddy = dets[static_cast<int64_t>(j) * DC + 1] - ko[1];
                float norm = std::sqrt(ddx * ddx + ddy * ddy) + 1e-6f;
                velocity_[static_cast<size_t>(i) * 2 + 0] = ddy / norm;
                velocity_[static_cast<size_t>(i) * 2 + 1] = ddx / norm;
            }

            float obs[6];
            std::copy(&dets[static_cast<int64_t>(j) * DC],
                      &dets[static_cast<int64_t>(j) * DC + 5], obs);
            obs[5] = dets[static_cast<int64_t>(j) * DC + 5];
            std::memcpy(&last_obs_[static_cast<size_t>(i) * 6], obs, sizeof(obs));
            int slot = age_[i] % R;
            std::memcpy(&obs_ring_[(static_cast<size_t>(i) * R + slot) * 6], obs,
                        sizeof(obs));
            ring_age_[static_cast<size_t>(i) * R + slot] = age_[i];
            std::memcpy(&last_meas_[static_cast<size_t>(i) * 5], z2, sizeof(float) * 5);
            has_obs_[i] = 1;
            hits_[i] += 1;
            hit_streak_[i] += 1;
            conf_[i] = dets[static_cast<int64_t>(j) * DC + 5];
            cls_[i] = dets[static_cast<int64_t>(j) * DC + 6];
            det_ind_[i] = static_cast<float>(j);
            tsu_[i] = 0;
        }

        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            if (!matched[i] && prev_observed[i]) {
                std::memcpy(&frozen_mean_[static_cast<size_t>(i) * DX],
                            &mean_[static_cast<size_t>(i) * DX], sizeof(float) * DX);
                std::memcpy(&frozen_cov_[static_cast<size_t>(i) * DX * DX],
                            &cov_[static_cast<size_t>(i) * DX * DX],
                            sizeof(float) * DX * DX);
            }
            observed_[i] = matched[i];
        }

        // new tracks
        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!first[static_cast<size_t>(j)] || dm[static_cast<size_t>(j)]) continue;
            while (free_cursor < K && active_[free_cursor]) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            kf_.initiate(&det_meas[static_cast<size_t>(j) * 5],
                         &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            active_[i] = 1;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * DC + 5];
            cls_[i] = dets[j * DC + 6];
            det_ind_[i] = static_cast<float>(j);
            age_[i] = 0;
            tsu_[i] = 0;
            hits_[i] = 0;
            hit_streak_[i] = 0;
            has_obs_[i] = 0;
            observed_[i] = 0;
            velocity_[static_cast<size_t>(i) * 2 + 0] = 0.0f;
            velocity_[static_cast<size_t>(i) * 2 + 1] = 0.0f;
            for (int c = 0; c < 6; ++c) last_obs_[static_cast<size_t>(i) * 6 + c] = -1.0f;
            for (int r = 0; r < R; ++r) ring_age_[static_cast<size_t>(i) * R + r] = -1;
        }

        // removal + output (last observation box when available)
        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (active_[i] && tsu_[i] > cfg_.max_age) active_[i] = 0;
            if (!active_[i] || tsu_[i] >= 1) continue;
            if (hit_streak_[i] < cfg_.min_hits && frame > cfg_.min_hits) continue;
            float* row = out + m_out * 9;
            if (has_obs_[i]) {
                std::memcpy(row, &last_obs_[static_cast<size_t>(i) * 6],
                            sizeof(float) * 5);
            } else {
                xysr_to_obb(&mean_[static_cast<size_t>(i) * DX], row);
            }
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
    // pass-1 with the unique-candidate shortcut; the velocity cost
    // replicates the reference's AABB-center formula applied to xywha
    // columns (association.py quirk preserved by the device program)
    std::vector<int32_t> associate_pass1(const std::vector<float>& iou1,
                                         const std::vector<float>& k_obs,
                                         const float* dets, int64_t n,
                                         const std::vector<char>& cols) const {
        const int K = cfg_.capacity;
        const int DC = 7;
        std::vector<int32_t> result(static_cast<size_t>(K), -1);
        std::vector<int> row_cnt(static_cast<size_t>(K), 0), col_cnt(static_cast<size_t>(n), 0);
        std::vector<int32_t> row_cand(static_cast<size_t>(K), -1);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            for (int64_t j = 0; j < n; ++j) {
                if (!cols[static_cast<size_t>(j)]) continue;
                if (iou1[static_cast<size_t>(i) * n + j] > cfg_.iou_threshold) {
                    row_cnt[i] += 1;
                    col_cnt[static_cast<size_t>(j)] += 1;
                    row_cand[i] = static_cast<int32_t>(j);
                }
            }
        }
        int max_row = 0, max_col = 0;
        for (int i = 0; i < K; ++i) max_row = std::max(max_row, row_cnt[i]);
        for (int64_t j = 0; j < n; ++j) max_col = std::max(max_col, col_cnt[static_cast<size_t>(j)]);
        if (max_row == 1 && max_col == 1) {
            for (int i = 0; i < K; ++i)
                if (row_cnt[i] == 1) result[i] = row_cand[i];
            return result;
        }
        std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            const float* ko = &k_obs[static_cast<size_t>(i) * 6];
            float vy = velocity_[static_cast<size_t>(i) * 2 + 0];
            float vx = velocity_[static_cast<size_t>(i) * 2 + 1];
            bool valid_vel = ko[4] >= 0.0f;  // theta column gates (quirk)
            float fcx = (ko[0] + ko[2]) / 2.0f;  // (cx + w)/2 — quirk
            float fcy = (ko[1] + ko[3]) / 2.0f;
            for (int64_t j = 0; j < n; ++j) {
                float angle_cost = 0.0f;
                if (valid_vel) {
                    float tcx = (dets[j * DC + 0] + dets[j * DC + 2]) / 2.0f;
                    float tcy = (dets[j * DC + 1] + dets[j * DC + 3]) / 2.0f;
                    float ddx = tcx - fcx, ddy = tcy - fcy;
                    float norm = std::sqrt(ddx * ddx + ddy * ddy) + 1e-6f;
                    float cosv = std::min(
                        1.0f, std::max(-1.0f, vx * (ddx / norm) + vy * (ddy / norm)));
                    float diff_angle =
                        (static_cast<float>(M_PI) / 2.0f - std::abs(std::acos(cosv))) /
                        static_cast<float>(M_PI);
                    angle_cost = diff_angle * cfg_.inertia * dets[j * DC + 5];
                }
                cost[static_cast<size_t>(i) * n + j] =
                    -(static_cast<double>(iou1[static_cast<size_t>(i) * n + j]) +
                      angle_cost);
            }
        }
        std::vector<char> rows(active_);
        std::vector<int32_t> r2c = full_assignment(cost, K, n, rows, cols);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c[i];
            if (j >= 0 && iou1[static_cast<size_t>(i) * n + j] >= cfg_.iou_threshold)
                result[i] = j;
        }
        return result;
    }

    OcSortConfig cfg_;
    KalmanBank<XysrObbLayout> kf_{XysrObbLayout()};
    std::vector<float> mean_, cov_, frozen_mean_, frozen_cov_;
    std::vector<float> conf_, cls_, det_ind_, last_obs_, obs_ring_, velocity_, last_meas_;
    std::vector<int32_t> age_, tsu_, hits_, hit_streak_, tid_, ring_age_;
    std::vector<char> active_, has_obs_, observed_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

}  // namespace boxmot

#endif  // BOXMOT_OCSORT_BANK_HPP
