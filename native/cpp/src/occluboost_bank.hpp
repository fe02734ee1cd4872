// OccluBoost (the flagship tracker) as a fixed-capacity slot bank.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/occluboost.py (occluboost_step) in its
// motion-only configuration (with_reid=False, identity camera warp):
// BoostTrack's multi-cue association and DLO/DUO boosting, BotSort-style
// confirmation states (confirm_hits / instant_confirm / tentative aging),
// AMS abnormal-motion gain damping with the shrink-ratio sanity check,
// the optional low-confidence second pass, and vectorized
// duplicate-emission suppression keeping the older track.  The
// appearance passes (ReID recovery, online GTA, graveyard resurrection)
// are gated on with_reid in the device program and therefore absent
// here by the same semantics.  Reference:
// boxmot/trackers/bbox/occluboost/occluboost.py:62-1259.

#ifndef BOXMOT_OCCLUBOOST_BANK_HPP
#define BOXMOT_OCCLUBOOST_BANK_HPP

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "boosttrack_bank.hpp"

namespace boxmot {

struct OccluBoostConfig {
    BoostTrackConfig boost;  // shared BoostTrack surface
    float track_low_thresh = 0.1f;
    float second_iou_thresh = 0.6f;
    int second_pass_max_age = 1;
    int second_pass_min_hits = 3;
    bool use_second_pass = false;
    float new_track_thresh = 0.6f;
    int confirm_hits = 2;
    float instant_confirm_thresh = 0.7f;
    int tentative_max_age = 1;
    float duplicate_iou_thresh = 0.85f;
    bool ams_enabled = true;
    float ams_alpha0 = 0.4f;
    float ams_threshold = 0.5f;
    int ams_buffer_size = 30;
    float ams_shrink_ratio = 0.75f;

    static OccluBoostConfig from_string(const char* s) {
        auto kv = parse_config(s);
        OccluBoostConfig c;
        c.boost.load(kv);
        c.track_low_thresh = static_cast<float>(cfg_get(kv, "track_low_thresh", c.track_low_thresh));
        c.second_iou_thresh =
            static_cast<float>(cfg_get(kv, "second_iou_thresh", c.second_iou_thresh));
        c.second_pass_max_age =
            static_cast<int>(cfg_get(kv, "second_pass_max_age", c.second_pass_max_age));
        c.second_pass_min_hits =
            static_cast<int>(cfg_get(kv, "second_pass_min_hits", c.second_pass_min_hits));
        c.use_second_pass = cfg_get(kv, "use_second_pass", 0.0) != 0.0;
        c.new_track_thresh = std::max(
            static_cast<float>(cfg_get(kv, "new_track_thresh", c.new_track_thresh)), 0.0f);
        c.confirm_hits = std::max(static_cast<int>(cfg_get(kv, "confirm_hits", c.confirm_hits)), 1);
        c.instant_confirm_thresh =
            static_cast<float>(cfg_get(kv, "instant_confirm_thresh", c.instant_confirm_thresh));
        c.tentative_max_age =
            std::max(static_cast<int>(cfg_get(kv, "tentative_max_age", c.tentative_max_age)), 0);
        c.duplicate_iou_thresh =
            static_cast<float>(cfg_get(kv, "duplicate_iou_thresh", c.duplicate_iou_thresh));
        c.ams_enabled = cfg_get(kv, "ams_enabled", 1.0) != 0.0;
        c.ams_alpha0 = std::min(std::max(
            static_cast<float>(cfg_get(kv, "ams_alpha0", c.ams_alpha0)), 0.0f), 1.0f);
        c.ams_threshold =
            std::max(static_cast<float>(cfg_get(kv, "ams_threshold", c.ams_threshold)), 0.0f);
        c.ams_buffer_size =
            std::max(static_cast<int>(cfg_get(kv, "ams_buffer_size", c.ams_buffer_size)), 2);
        c.ams_shrink_ratio = std::min(std::max(
            static_cast<float>(cfg_get(kv, "ams_shrink_ratio", c.ams_shrink_ratio)), 0.0f), 1.0f);
        return c;
    }
};

class OccluBoostCore {
  public:
    static constexpr int DX = 8;

    explicit OccluBoostCore(const OccluBoostConfig& cfg)
        : cfg_(cfg),
          cmc_(cfg.boost.cmc_euclidean ? 1 : 0, cfg.boost.cmc_max_iter,
               cfg.boost.cmc_scale) {
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.boost.capacity);
        const size_t B = static_cast<size_t>(cfg_.ams_buffer_size);
        mean_.assign(K * DX, 0.0f);
        cov_.assign(K * DX * DX, 0.0f);
        active_.assign(K, 0);
        age_.assign(K, 0);
        tsu_.assign(K, 0);
        hit_streak_.assign(K, 0);
        tid_.assign(K, 0);
        conf_.assign(K, 0.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        is_activated_.assign(K, 0);
        ams_ring_.assign(K * B * 4, 0.0f);
        ams_count_.assign(K, 0);
        cmc_.reset();
        frame_count_ = 0;
        next_id_ = 1;
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        return step_warp(dets, n, Warp2x3(), out);
    }

    int64_t step_img(const float* dets, int64_t n, const uint8_t* img, int64_t H,
                     int64_t W, float* out) {
        Warp2x3 warp;
        if (cfg_.boost.use_cmc && img) warp = cmc_.apply(img, H, W);
        return step_warp(dets, n, warp, out);
    }

    int64_t step_warp(const float* dets, int64_t n, const Warp2x3& warp, float* out) {
        const BoostTrackConfig& bc = cfg_.boost;
        const int K = bc.capacity;
        const int32_t frame = ++frame_count_;

        // --- camera update before predict (occluboost_step)
        boost_camera_update(mean_, active_, K, DX, warp);

        // --- predict + track confidence
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            kf_.predict(&mean_[static_cast<size_t>(i) * DX],
                        &cov_[static_cast<size_t>(i) * DX * DX]);
            age_[i] += 1;
            if (tsu_[i] > 0) hit_streak_[i] = 0;
            tsu_[i] += 1;
        }
        std::vector<float> trk_conf(static_cast<size_t>(K), 0.0f);
        std::vector<float> trk_box(static_cast<size_t>(K) * 4, 0.0f);
        bool any_track = false;
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            any_track = true;
            trk_conf[i] = boost_track_confidence(age_[i], tsu_[i]);
            xyhr_to_xyxy(&mean_[static_cast<size_t>(i) * DX], &trk_box[static_cast<size_t>(i) * 4]);
        }

        std::vector<float> conf(static_cast<size_t>(n)), orig_conf(static_cast<size_t>(n));
        std::vector<float> det_z(static_cast<size_t>(n) * 4);
        for (int64_t j = 0; j < n; ++j) {
            conf[static_cast<size_t>(j)] = orig_conf[static_cast<size_t>(j)] = dets[j * 6 + 4];
            xyxy_to_xyhr(&dets[j * 6], &det_z[static_cast<size_t>(j) * 4]);
        }

        std::vector<float> md =
            boost_mh_distance(det_z.data(), n, K, DX, mean_, cov_, active_);
        if (bc.use_dlo_boost)
            boost_dlo(bc, dets, n, conf, trk_box, trk_conf, md, active_, tsu_, K);
        if (bc.use_duo_boost && any_track)
            boost_duo(bc, dets, n, conf, md, active_, K);

        std::vector<char> first(static_cast<size_t>(n), 0), second(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j) {
            first[static_cast<size_t>(j)] = conf[static_cast<size_t>(j)] >= bc.det_thresh;
            if (cfg_.use_second_pass)
                second[static_cast<size_t>(j)] = !first[static_cast<size_t>(j)] &&
                                                 orig_conf[static_cast<size_t>(j)] >= cfg_.track_low_thresh &&
                                                 orig_conf[static_cast<size_t>(j)] < bc.det_thresh;
        }

        // --- pass 1: BoostTrack multi-cue association
        std::vector<float> iou_dk(static_cast<size_t>(n) * static_cast<size_t>(K), 0.0f);
        for (int64_t j = 0; j < n; ++j) {
            if (!first[static_cast<size_t>(j)]) continue;
            for (int i = 0; i < K; ++i)
                if (active_[i])
                    iou_dk[static_cast<size_t>(j) * K + i] =
                        iou_xyxy(&dets[j * 6], &trk_box[static_cast<size_t>(i) * 4]);
        }
        std::vector<float> mh_sim = boost_mh_similarity(md, n, K, first, active_);
        std::vector<double> cost_kd =
            boost_cost_kd(bc, dets, n, K, iou_dk, mh_sim, conf, trk_conf, trk_box);
        std::vector<int32_t> r2c =
            boost_match(bc.iou_threshold, cost_kd, n, K, active_, first);
        std::vector<char> dm(static_cast<size_t>(n), 0), inv_det(static_cast<size_t>(n), 0);
        std::vector<char> unmatched_trk0(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c[i];
            if (j >= 0 && iou_dk[static_cast<size_t>(j) * K + i] >= bc.iou_threshold) {
                dm[static_cast<size_t>(j)] = 1;
            } else {
                if (j >= 0) {
                    inv_det[static_cast<size_t>(j)] = 1;
                    r2c[i] = -1;
                }
                unmatched_trk0[i] = active_[i];
            }
        }

        // --- KF + AMS + confirmation bookkeeping for pass-1 matches
        for (int i = 0; i < K; ++i)
            if (r2c[i] >= 0) apply_update(i, r2c[i], dets, det_z, conf);

        // --- optional low-confidence second pass (occluboost.py:347-407;
        // the appearance gate is reid-only and absent here)
        if (cfg_.use_second_pass) {
            std::vector<char> elig2(static_cast<size_t>(K), 0);
            for (int i = 0; i < K; ++i)
                elig2[i] = unmatched_trk0[i] && tsu_[i] <= cfg_.second_pass_max_age &&
                           hit_streak_[i] >= cfg_.second_pass_min_hits && is_activated_[i];
            std::vector<double> cost2(static_cast<size_t>(K) * static_cast<size_t>(n), 1.0);
            for (int i = 0; i < K; ++i) {
                if (!elig2[i]) continue;
                for (int64_t j = 0; j < n; ++j) {
                    float iou = iou_xyxy(&trk_box[static_cast<size_t>(i) * 4], &dets[j * 6]);
                    cost2[static_cast<size_t>(i) * n + j] =
                        iou < cfg_.second_iou_thresh ? 1.0 : 1.0 - iou;
                }
            }
            std::vector<int32_t> r2c2 = masked_assignment(cost2, K, n, elig2, second, 1.0);
            for (int i = 0; i < K; ++i)
                if (r2c2[i] >= 0) apply_update(i, r2c2[i], dets, det_z, conf);
        }

        // --- new tracks: slots filled in ascending det order; ids follow
        // the reference's unmatched ordering (invalidated assignments
        // last, occluboost_step order_key)
        std::vector<int32_t> new_dets;
        for (int64_t j = 0; j < n; ++j)
            if (first[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)] &&
                conf[static_cast<size_t>(j)] >= cfg_.new_track_thresh)
                new_dets.push_back(static_cast<int32_t>(j));
        // id rank: fresh dets ordered by (inv_det, det index)
        std::vector<int32_t> id_rank(new_dets.size(), 0);
        for (size_t a = 0; a < new_dets.size(); ++a) {
            int32_t ka = new_dets[a] + (inv_det[static_cast<size_t>(new_dets[a])] ? static_cast<int32_t>(n) : 0);
            int32_t r = 0;
            for (size_t b = 0; b < new_dets.size(); ++b) {
                int32_t kb = new_dets[b] + (inv_det[static_cast<size_t>(new_dets[b])] ? static_cast<int32_t>(n) : 0);
                if (kb < ka) ++r;
            }
            id_rank[a] = r;
        }
        int free_cursor = 0;
        const int32_t base_id = next_id_;
        for (size_t a = 0; a < new_dets.size(); ++a) {
            int32_t j = new_dets[a];
            while (free_cursor < K && active_[free_cursor]) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            kf_.initiate(&det_z[static_cast<size_t>(j) * 4],
                         &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            active_[i] = 1;
            tid_[i] = base_id + id_rank[a];
            conf_[i] = conf[static_cast<size_t>(j)];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            age_[i] = 0;
            tsu_[i] = 0;
            hit_streak_[i] = 0;
            ams_count_[i] = 0;
            is_activated_[i] = conf[static_cast<size_t>(j)] >= cfg_.instant_confirm_thresh ||
                               cfg_.confirm_hits <= 1;
        }
        // the device program advances next_id by the full new-det count
        // even when slot capacity truncates (occluboost_step n_fresh)
        next_id_ = base_id + static_cast<int32_t>(new_dets.size());

        // --- emission + vectorized duplicate suppression
        // (occluboost.py:427-475, 869-905)
        std::vector<char> emit(static_cast<size_t>(K), 0);
        std::vector<float> out_box(static_cast<size_t>(K) * 4);
        bool warmup = frame <= bc.min_hits;
        for (int i = 0; i < K; ++i) {
            xyhr_to_xyxy(&mean_[static_cast<size_t>(i) * DX], &out_box[static_cast<size_t>(i) * 4]);
            emit[i] = active_[i] && tsu_[i] < 1 && is_activated_[i] &&
                      (hit_streak_[i] >= bc.min_hits || warmup);
        }
        if (cfg_.duplicate_iou_thresh > 0.0f && cfg_.duplicate_iou_thresh < 1.0f) {
            std::vector<char> kill(static_cast<size_t>(K), 0);
            for (int i = 0; i < K; ++i) {
                if (!emit[i]) continue;
                for (int j = 0; j < K; ++j) {
                    if (i == j || !emit[j]) continue;
                    if (age_[i] < age_[j]) continue;  // killer must be older-or-equal
                    if (iou_xyxy(&out_box[static_cast<size_t>(i) * 4],
                                 &out_box[static_cast<size_t>(j) * 4]) >=
                        cfg_.duplicate_iou_thresh)
                        kill[j] = 1;
                }
            }
            for (int i = 0; i < K; ++i)
                if (kill[i]) {
                    emit[i] = 0;
                    active_[i] = 0;  // removed entirely (occluboost.py:899-904)
                }
        }

        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (!emit[i]) continue;
            const float* box = &out_box[static_cast<size_t>(i) * 4];
            float w = box[2] - box[0], h = box[3] - box[1];
            if (w / std::max(h, 1e-12f) > bc.aspect_ratio_thresh) continue;
            if (w * h <= bc.min_box_area) continue;
            float* row = out + m_out * 8;
            std::copy(box, box + 4, row);
            row[4] = static_cast<float>(tid_[i]);
            row[5] = conf_[i];
            row[6] = cls_[i];
            row[7] = det_ind_[i];
            ++m_out;
        }

        // --- lifecycle: confirmed tracks age out at max_age, tentative
        // ones at tentative_max_age (occluboost.py:477-495)
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            bool alive = tsu_[i] <= bc.max_age &&
                         (is_activated_[i] || tsu_[i] <= cfg_.tentative_max_age);
            if (!alive) active_[i] = 0;
        }
        return m_out;
    }

    int capacity() const { return cfg_.boost.capacity; }
    // id the next created track will carry in the output rows
    int64_t next_track_id() const { return next_id_; }

  private:
    // KF + AMS + bookkeeping for one matched slot (apply_update in
    // occluboost_step, motion-only fields)
    void apply_update(int i, int32_t j, const float* dets,
                      const std::vector<float>& det_z,
                      const std::vector<float>& conf) {
        const int B = cfg_.ams_buffer_size;
        float cx = (dets[static_cast<int64_t>(j) * 6 + 0] + dets[static_cast<int64_t>(j) * 6 + 2]) / 2.0f;
        float cy = (dets[static_cast<int64_t>(j) * 6 + 1] + dets[static_cast<int64_t>(j) * 6 + 3]) / 2.0f;
        float w = std::max(dets[static_cast<int64_t>(j) * 6 + 2] - dets[static_cast<int64_t>(j) * 6 + 0], 1e-6f);
        float h = std::max(dets[static_cast<int64_t>(j) * 6 + 3] - dets[static_cast<int64_t>(j) * 6 + 1], 1e-6f);
        float cxcywh[4] = {cx, cy, w, h};
        float alpha = ams_alpha(i, cxcywh);
        // append to the observation ring AFTER computing alpha
        float* slot = &ams_ring_[(static_cast<size_t>(i) * B + (ams_count_[i] % B)) * 4];
        std::memcpy(slot, cxcywh, sizeof(cxcywh));
        ams_count_[i] += 1;
        kf_.update(&mean_[static_cast<size_t>(i) * DX],
                   &cov_[static_cast<size_t>(i) * DX * DX],
                   &det_z[static_cast<size_t>(j) * 4], 0.0f, alpha);
        hit_streak_[i] += 1;
        tsu_[i] = 0;
        conf_[i] = conf[static_cast<size_t>(j)];
        cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
        det_ind_[i] = static_cast<float>(j);
        if (hit_streak_[i] >= cfg_.confirm_hits) is_activated_[i] = 1;
    }

    // abnormal-motion-suppression alpha (occluboost.py:778-846),
    // computed BEFORE the current observation is appended
    float ams_alpha(int i, const float* cur) const {
        if (!cfg_.ams_enabled || cfg_.ams_alpha0 >= 1.0f) return 1.0f;
        const int B = cfg_.ams_buffer_size;
        int count = ams_count_[i];
        int live = std::min(count, B);
        if (live < 2) return 1.0f;
        const float* ring = &ams_ring_[static_cast<size_t>(i) * B * 4];
        const float* prev = &ring[((count - 1) % B) * 4];
        const float* oldest = &ring[((count - live) % B) * 4];
        float denom = static_cast<float>(std::max(live - 1, 1));
        float cur_v[4], mean_v[4];
        for (int d = 0; d < 4; ++d) {
            cur_v[d] = cur[d] - prev[d];
            mean_v[d] = (prev[d] - oldest[d]) / denom;
        }
        const float eps = 1e-6f;
        float cur_c = std::hypot(cur_v[0], cur_v[1]);
        float mean_c = std::hypot(mean_v[0], mean_v[1]);
        float cur_a = std::hypot(cur_v[2], cur_v[3]);
        float mean_a = std::hypot(mean_v[2], mean_v[3]);
        float d_c = std::max(0.0f, cur_c - mean_c) / std::max(mean_c, eps);
        float d_a = std::max(0.0f, cur_a - mean_a) / std::max(mean_a, eps);
        float alpha_c = d_c <= cfg_.ams_threshold ? 1.0f : cfg_.ams_alpha0;
        float alpha_a = d_a <= cfg_.ams_threshold ? 1.0f : cfg_.ams_alpha0;
        float alpha = 0.5f * (alpha_c + alpha_a);
        // shrink-ratio sanity check: only suppress genuinely shrinking boxes
        float mean_area = 0.0f;
        for (int t = 0; t < live; ++t) {
            const float* r = &ring[((count - live + t) % B) * 4];
            mean_area += r[2] * r[3];
        }
        mean_area /= static_cast<float>(live);
        if (cur[2] * cur[3] >= mean_area * cfg_.ams_shrink_ratio) return 1.0f;
        return alpha;
    }

    OccluBoostConfig cfg_;
    EccCmc cmc_;
    KalmanBank<XyhrLayout> kf_{XyhrLayout()};
    std::vector<float> mean_, cov_, conf_, cls_, det_ind_, ams_ring_;
    std::vector<int32_t> age_, tsu_, hit_streak_, tid_, ams_count_;
    std::vector<char> active_, is_activated_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

}  // namespace boxmot

#endif  // BOXMOT_OCCLUBOOST_BANK_HPP
