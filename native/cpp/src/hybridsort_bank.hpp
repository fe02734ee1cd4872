// HybridSort as a fixed-capacity slot bank on the CPU.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/hybridsort.py (hybridsort_step) in its
// motion-only configuration (with_reid=False): score-aware tracking on
// the 9-D XYSCR filter with four-corner-point velocity consistency,
// tracklet confidence modelling (TCM: -|kalman_score - det_conf| in
// pass 1, TCM_byte_step_weight * |simple_score - det_conf| in the BYTE
// pass), the final-chance pass against last observations, and the
// XYSCR ORU freeze/replay with confidence interpolation.  Reference:
// boxmot/trackers/bbox/hybridsort/hybridsort.py:104-737,
// association.py:475-657.  Output ids are tid + 1 (internal ids start
// at 0, the reference quirk).

#ifndef BOXMOT_HYBRIDSORT_BANK_HPP
#define BOXMOT_HYBRIDSORT_BANK_HPP

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "kalman_bank.hpp"
#include "slot_common.hpp"

namespace boxmot {

struct HybridSortConfig {
    float det_thresh = 0.5f;  // high-score threshold
    float low_thresh = 0.1f;
    int max_age = 30;
    int min_hits = 3;
    float iou_threshold = 0.3f;
    int delta_t = 3;
    float inertia = 0.05f;
    bool use_byte = true;
    float track_thresh = 0.5f;
    bool tcm_byte_step = true;
    float tcm_byte_step_weight = 1.0f;
    int asso_code = kAssoIoU;  // numeric asso_func (slot_common.hpp)
    int capacity = 256;

    static HybridSortConfig from_string(const char* s) {
        auto kv = parse_config(s);
        HybridSortConfig c;
        c.det_thresh = static_cast<float>(cfg_get(kv, "det_thresh", c.det_thresh));
        c.low_thresh = static_cast<float>(cfg_get(kv, "low_thresh", c.low_thresh));
        c.max_age = static_cast<int>(cfg_get(kv, "max_age", c.max_age));
        c.min_hits = static_cast<int>(cfg_get(kv, "min_hits", c.min_hits));
        c.iou_threshold = static_cast<float>(cfg_get(kv, "iou_threshold", c.iou_threshold));
        c.delta_t = static_cast<int>(cfg_get(kv, "delta_t", c.delta_t));
        c.inertia = static_cast<float>(cfg_get(kv, "inertia", c.inertia));
        c.use_byte = cfg_get(kv, "use_byte", 1.0) != 0.0;
        c.track_thresh = static_cast<float>(cfg_get(kv, "track_thresh", c.track_thresh));
        c.tcm_byte_step = cfg_get(kv, "TCM_byte_step", 1.0) != 0.0;
        c.tcm_byte_step_weight =
            static_cast<float>(cfg_get(kv, "TCM_byte_step_weight", c.tcm_byte_step_weight));
        c.asso_code = static_cast<int>(cfg_get(kv, "asso_code", c.asso_code));
        c.capacity = static_cast<int>(cfg_get(kv, "capacity", c.capacity));
        return c;
    }
};

class HybridSortCore {
  public:
    static constexpr int DX = 9;
    // corner -> (x column, y column) of an xyxy box: lt, rt, lb, rb
    static constexpr int kCornerCols[4][2] = {{0, 1}, {0, 3}, {2, 1}, {2, 3}};

    explicit HybridSortCore(const HybridSortConfig& cfg) : cfg_(cfg) { reset(); }

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
        conf_pre_.assign(K, -1.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        last_obs_.assign(K * 5, -1.0f);
        has_obs_.assign(K, 0);
        obs_ring_.assign(K * R * 5, -1.0f);
        ring_age_.assign(K * R, -1);
        vel_.assign(K * 8, 0.0f);  // (K, 4 corners, [dy, dx])
        observed_.assign(K, 0);
        last_meas_.assign(K * 5, 0.0f);
        frame_count_ = 0;
        next_id_ = 0;  // emitted as tid + 1
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        const int K = cfg_.capacity;
        const int R = cfg_.delta_t;
        const int32_t frame = ++frame_count_;

        std::vector<char> first(static_cast<size_t>(n), 0), second(static_cast<size_t>(n), 0);
        std::vector<float> det_z(static_cast<size_t>(n) * 5);
        for (int64_t j = 0; j < n; ++j) {
            float c = dets[j * 6 + 4];
            first[static_cast<size_t>(j)] = c > cfg_.det_thresh;
            second[static_cast<size_t>(j)] = (c > cfg_.low_thresh) && (c < cfg_.det_thresh);
            bbox_to_z(&dets[j * 6], c, &det_z[static_cast<size_t>(j) * 5]);
        }

        std::vector<char> prev_observed = observed_, prev_has_obs = has_obs_;
        std::vector<float> prev_conf = conf_, prev_conf_pre = conf_pre_;
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            float* m = &mean_[static_cast<size_t>(i) * DX];
            if (m[7] + m[2] <= 0.0f) m[7] = 0.0f;  // area-velocity guard
            kf_.predict(m, &cov_[static_cast<size_t>(i) * DX * DX]);
            age_[i] += 1;
            if (tsu_[i] > 0) hit_streak_[i] = 0;
            tsu_[i] += 1;
        }

        std::vector<float> trk_box(static_cast<size_t>(K) * 4);
        std::vector<float> kal_score(static_cast<size_t>(K), 0.0f);
        std::vector<float> simple_score(static_cast<size_t>(K), 0.0f);
        for (int i = 0; i < K; ++i) {
            x_to_bbox(&mean_[static_cast<size_t>(i) * DX], &trk_box[static_cast<size_t>(i) * 4]);
            kal_score[i] = std::min(std::max(mean_[static_cast<size_t>(i) * DX + 3],
                                             cfg_.track_thresh), 1.0f);
            // confidence trend (hybridsort.py:284-321)
            if (prev_conf_pre[i] < 0)
                simple_score[i] = std::min(std::max(prev_conf[i], 0.1f), cfg_.track_thresh);
            else
                simple_score[i] = std::min(
                    std::max(prev_conf[i] - (prev_conf_pre[i] - prev_conf[i]), 0.1f),
                    cfg_.track_thresh);
        }

        // k_previous_obs
        std::vector<float> k_obs(static_cast<size_t>(K) * 5);
        for (int i = 0; i < K; ++i) {
            const float* chosen = &last_obs_[static_cast<size_t>(i) * 5];
            for (int d = 0; d < R; ++d) {
                int target = age_[i] - (R - d);
                if (target < 0) continue;
                int slot = target % R;
                if (ring_age_[static_cast<size_t>(i) * R + slot] == target) {
                    chosen = &obs_ring_[(static_cast<size_t>(i) * R + slot) * 5];
                    break;
                }
            }
            std::memcpy(&k_obs[static_cast<size_t>(i) * 5], chosen, sizeof(float) * 5);
        }

        // pass 1: iou + 4-corner velocity + TCM score difference
        std::vector<float> iou1(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                iou1[static_cast<size_t>(i) * n + j] = asso_xyxy(
                    cfg_.asso_code, &trk_box[static_cast<size_t>(i) * 4],
                    &dets[j * 6]);
        }
        std::vector<int32_t> r2c1 =
            associate_pass1(iou1, k_obs, kal_score, dets, n, first);
        std::vector<char> matched(static_cast<size_t>(K), 0), dm(static_cast<size_t>(n), 0);
        std::vector<int32_t> det_col(static_cast<size_t>(K), -1);
        for (int i = 0; i < K; ++i) {
            if (r2c1[i] < 0) continue;
            matched[i] = 1;
            det_col[i] = r2c1[i];
            dm[static_cast<size_t>(r2c1[i])] = 1;
        }

        // BYTE pass with the TCM score trend term
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
                std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0);
                for (int i = 0; i < K; ++i)
                    for (int64_t j = 0; j < n; ++j) {
                        double v = -static_cast<double>(iou1[static_cast<size_t>(i) * n + j]);
                        if (cfg_.tcm_byte_step)
                            v += cfg_.tcm_byte_step_weight *
                                 std::abs(simple_score[i] - dets[j * 6 + 4]);
                        cost[static_cast<size_t>(i) * n + j] = v;
                    }
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

        // final chance: leftover first dets vs last observations
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
                    float v = asso_xyxy(cfg_.asso_code,
                                        &last_obs_[static_cast<size_t>(i) * 5],
                                        &dets[j * 6]);
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

        // ORU replay + regular update + bookkeeping
        for (int i = 0; i < K; ++i) {
            if (!matched[i]) continue;
            int32_t j = det_col[i];
            const float* z2 = &det_z[static_cast<size_t>(j) * 5];
            float* m = &mean_[static_cast<size_t>(i) * DX];
            float* P = &cov_[static_cast<size_t>(i) * DX * DX];
            bool rejoin = !prev_observed[i] && prev_has_obs[i] && tsu_[i] > 1;
            if (rejoin) {
                std::memcpy(m, &frozen_mean_[static_cast<size_t>(i) * DX],
                            sizeof(float) * DX);
                std::memcpy(P, &frozen_cov_[static_cast<size_t>(i) * DX * DX],
                            sizeof(float) * DX * DX);
                const float* m1 = &last_meas_[static_cast<size_t>(i) * 5];
                int gap = tsu_[i];
                float w1 = std::sqrt(std::max(m1[2] * m1[4], 1e-12f));
                float h1 = std::sqrt(std::max(m1[2] / std::max(m1[4], 1e-12f), 1e-12f));
                float w2 = std::sqrt(std::max(z2[2] * z2[4], 1e-12f));
                float h2 = std::sqrt(std::max(z2[2] / std::max(z2[4], 1e-12f), 1e-12f));
                float gapf = std::max(static_cast<float>(gap), 1.0f);
                float dx = (z2[0] - m1[0]) / gapf;
                float dy = (z2[1] - m1[1]) / gapf;
                float dw = (w2 - w1) / gapf;
                float dh = (h2 - h1) / gapf;
                float dc = (z2[3] - m1[3]) / gapf;
                for (int s = 1; s <= gap; ++s) {
                    if (s > 1) kf_.predict(m, P);
                    float fs = static_cast<float>(s);
                    float wi = w1 + fs * dw;
                    float hi = h1 + fs * dh;
                    float zi[5] = {m1[0] + fs * dx, m1[1] + fs * dy,
                                   std::max(wi * hi, 1e-6f), m1[3] + fs * dc,
                                   std::max(wi / std::max(hi, 1e-12f), 1e-6f)};
                    kf_.update(m, P, zi);
                }
            }
            kf_.update(m, P, z2);

            // corner velocities: sum of unit vectors over the window
            if (prev_has_obs[i]) {
                float acc[4][2] = {};
                bool any_prev = false;
                for (int d = 0; d < R; ++d) {
                    int target = age_[i] - d - 1;
                    if (target < 0) continue;
                    int slot = target % R;
                    if (ring_age_[static_cast<size_t>(i) * R + slot] != target) continue;
                    const float* pb = &obs_ring_[(static_cast<size_t>(i) * R + slot) * 5];
                    corner_add(&dets[static_cast<int64_t>(j) * 6], pb, acc);
                    any_prev = true;
                }
                if (!any_prev) {
                    corner_add(&dets[static_cast<int64_t>(j) * 6],
                               &last_obs_[static_cast<size_t>(i) * 5], acc);
                }
                std::memcpy(&vel_[static_cast<size_t>(i) * 8], acc, sizeof(acc));
            }

            float obs[5];
            std::copy(&dets[static_cast<int64_t>(j) * 6],
                      &dets[static_cast<int64_t>(j) * 6 + 4], obs);
            obs[4] = dets[static_cast<int64_t>(j) * 6 + 4];
            std::memcpy(&last_obs_[static_cast<size_t>(i) * 5], obs, sizeof(obs));
            int slot = age_[i] % R;
            std::memcpy(&obs_ring_[(static_cast<size_t>(i) * R + slot) * 5], obs,
                        sizeof(obs));
            ring_age_[static_cast<size_t>(i) * R + slot] = age_[i];
            std::memcpy(&last_meas_[static_cast<size_t>(i) * 5], z2, sizeof(float) * 5);
            has_obs_[i] = 1;
            hits_[i] += 1;
            hit_streak_[i] += 1;
            conf_pre_[i] = prev_conf[i];
            conf_[i] = dets[static_cast<int64_t>(j) * 6 + 4];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            tsu_[i] = 0;
        }

        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            if (!matched[i]) {
                if (prev_observed[i]) {
                    std::memcpy(&frozen_mean_[static_cast<size_t>(i) * DX],
                                &mean_[static_cast<size_t>(i) * DX], sizeof(float) * DX);
                    std::memcpy(&frozen_cov_[static_cast<size_t>(i) * DX * DX],
                                &cov_[static_cast<size_t>(i) * DX * DX],
                                sizeof(float) * DX * DX);
                }
                conf_pre_[i] = -1.0f;  // update(None) clears the trend
            }
            observed_[i] = matched[i];
        }

        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!first[static_cast<size_t>(j)] || dm[static_cast<size_t>(j)]) continue;
            while (free_cursor < K && active_[free_cursor]) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            kf_.initiate(&det_z[static_cast<size_t>(j) * 5],
                         &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            active_[i] = 1;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * 6 + 4];
            conf_pre_[i] = -1.0f;
            cls_[i] = dets[j * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            age_[i] = 0;
            tsu_[i] = 0;
            hits_[i] = 0;
            hit_streak_[i] = 0;
            has_obs_[i] = 0;
            observed_[i] = 0;
            std::fill_n(&vel_[static_cast<size_t>(i) * 8], 8, 0.0f);
            for (int c = 0; c < 5; ++c) last_obs_[static_cast<size_t>(i) * 5 + c] = -1.0f;
            for (int r = 0; r < R; ++r) ring_age_[static_cast<size_t>(i) * R + r] = -1;
        }

        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (active_[i] && tsu_[i] > cfg_.max_age) active_[i] = 0;
            if (!active_[i] || tsu_[i] >= 1) continue;
            if (hit_streak_[i] < cfg_.min_hits && frame > cfg_.min_hits) continue;
            float* row = out + m_out * 8;
            if (has_obs_[i]) {
                std::memcpy(row, &last_obs_[static_cast<size_t>(i) * 5], sizeof(float) * 4);
            } else {
                x_to_bbox(&mean_[static_cast<size_t>(i) * DX], row);
            }
            row[4] = static_cast<float>(tid_[i] + 1);  // emitted ids start at 1
            row[5] = conf_[i];
            row[6] = cls_[i];
            row[7] = det_ind_[i];
            ++m_out;
        }
        return m_out;
    }

    int capacity() const { return cfg_.capacity; }
    // id the next created track will carry in the output rows
    // (internal ids start at 0, emitted as tid + 1)
    int64_t next_track_id() const { return next_id_ + 1; }

  private:
    std::vector<int32_t> associate_pass1(const std::vector<float>& iou1,
                                         const std::vector<float>& k_obs,
                                         const std::vector<float>& kal_score,
                                         const float* dets, int64_t n,
                                         const std::vector<char>& cols) const {
        const int K = cfg_.capacity;
        std::vector<int32_t> result(static_cast<size_t>(K), -1);
        // unique shortcut on raw IoU candidates (ocsort._unique_shortcut)
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
        // cost = -(iou + corner velocity costs - |kal_score - conf|)
        std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            const float* ko = &k_obs[static_cast<size_t>(i) * 5];
            bool valid_vel = ko[4] >= 0.0f;  // conf column of last_obs
            for (int64_t j = 0; j < n; ++j) {
                float angle_cost = 0.0f;
                if (valid_vel) {
                    for (int ci = 0; ci < 4; ++ci) {
                        int xc = kCornerCols[ci][0], yc = kCornerCols[ci][1];
                        float ddx = dets[j * 6 + xc] - ko[xc];
                        float ddy = dets[j * 6 + yc] - ko[yc];
                        float norm = std::sqrt(ddx * ddx + ddy * ddy) + 1e-6f;
                        float vy = vel_[static_cast<size_t>(i) * 8 + ci * 2 + 0];
                        float vx = vel_[static_cast<size_t>(i) * 8 + ci * 2 + 1];
                        float cosv = std::min(
                            1.0f, std::max(-1.0f, vx * (ddx / norm) + vy * (ddy / norm)));
                        float diff =
                            (static_cast<float>(M_PI) / 2.0f - std::abs(std::acos(cosv))) /
                            static_cast<float>(M_PI);
                        angle_cost += diff * cfg_.inertia * dets[j * 6 + 4];
                    }
                }
                angle_cost -= std::abs(kal_score[i] - dets[j * 6 + 4]);  // TCM
                cost[static_cast<size_t>(i) * n + j] =
                    -(static_cast<double>(iou1[static_cast<size_t>(i) * n + j]) +
                      angle_cost);
            }
        }
        std::vector<char> rows(active_);
        std::vector<int32_t> r2c = full_assignment(cost, K, n, rows, cols);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c[i];
            if (j < 0) continue;
            // gate: iou - score_dif >= iou_threshold (association.py:540-543)
            float thre = iou1[static_cast<size_t>(i) * n + j] -
                         std::abs(kal_score[i] - dets[static_cast<int64_t>(j) * 6 + 4]);
            if (thre >= cfg_.iou_threshold) result[i] = j;
        }
        return result;
    }

    void corner_add(const float* det6, const float* prev5, float acc[4][2]) const {
        for (int ci = 0; ci < 4; ++ci) {
            int xc = kCornerCols[ci][0], yc = kCornerCols[ci][1];
            float dx = det6[xc] - prev5[xc];
            float dy = det6[yc] - prev5[yc];
            float norm = std::sqrt(dx * dx + dy * dy) + 1e-6f;
            acc[ci][0] += dy / norm;
            acc[ci][1] += dx / norm;
        }
    }

    // [x1,y1,x2,y2] + conf -> [cx, cy, s, c, r] (hybridsort bbox_to_z)
    static void bbox_to_z(const float* b, float conf, float* z) {
        float w = b[2] - b[0];
        float h = b[3] - b[1];
        z[0] = b[0] + w / 2.0f;
        z[1] = b[1] + h / 2.0f;
        z[2] = std::max(w * h, 1e-6f);
        z[3] = conf;
        z[4] = std::max(w / std::max(h, 1e-6f), 1e-6f);
    }

    static void x_to_bbox(const float* s, float* box) {
        float w = std::sqrt(std::max(s[2] * s[4], 1e-12f));
        float h = s[2] / std::max(w, 1e-6f);
        box[0] = s[0] - w / 2.0f;
        box[1] = s[1] - h / 2.0f;
        box[2] = s[0] + w / 2.0f;
        box[3] = s[1] + h / 2.0f;
    }

    HybridSortConfig cfg_;
    KalmanBank<XyscrLayout> kf_{XyscrLayout()};
    std::vector<float> mean_, cov_, frozen_mean_, frozen_cov_;
    std::vector<float> conf_, conf_pre_, cls_, det_ind_, last_obs_, obs_ring_, vel_, last_meas_;
    std::vector<int32_t> age_, tsu_, hits_, hit_streak_, tid_, ring_age_;
    std::vector<char> active_, has_obs_, observed_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 0;
};

}  // namespace boxmot

#endif  // BOXMOT_HYBRIDSORT_BANK_HPP
