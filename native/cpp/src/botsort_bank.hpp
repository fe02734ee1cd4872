// BoT-SORT as a fixed-capacity slot bank on the CPU.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/botsort.py (botsort_step): the ByteTrack
// two-stage skeleton on the XYWH Kalman filter with BotSort's
// thresholds, the unconfirmed pass, confidence-weighted class voting,
// tracked/lost duplicate suppression, and — when `with_reid` is set and
// per-detection embeddings are supplied via step_embs — the appearance
// fusion (EMA smooth-feature bank, min(iou, emb) costs gated by
// proximity/appearance thresholds; botsort.py:257-323).  The reference's
// cpp replay likewise consumes cached dets+embs
// (boxmot/native/cpp/trackers/base/src/io.cpp).  Reference:
// boxmot/trackers/bbox/botsort/botsort.py:20-500, botsort_track.py.

#ifndef BOXMOT_BOTSORT_BANK_HPP
#define BOXMOT_BOTSORT_BANK_HPP

#include <algorithm>
#include <cstdint>
#include <vector>

#include "ecc_cmc.hpp"
#include "kalman_bank.hpp"
#include "slot_common.hpp"

namespace boxmot {

struct BotSortConfig {
    float track_high_thresh = 0.5f;
    float track_low_thresh = 0.1f;
    float new_track_thresh = 0.6f;
    float match_thresh = 0.8f;
    float second_match_thresh = 0.5f;
    float unconfirmed_match_thresh = 0.7f;
    bool fuse_first_associate = false;
    // appearance fusion (device botsort_step with_reid path)
    bool with_reid = false;
    float proximity_thresh = 0.5f;
    float appearance_thresh = 0.25f;
    float unconfirmed_emb_scale = 2.0f;
    float ema_alpha = 0.9f;
    int max_time_lost = 30;
    int nr_classes = 80;
    float std_weight_position = 1.0f / 20.0f;
    float std_weight_velocity = 1.0f / 160.0f;
    bool use_cmc = true;
    int cmc_max_iter = 50;
    float cmc_scale = 0.15f;
    bool cmc_euclidean = false;
    int capacity = 256;

    static BotSortConfig from_string(const char* s) {
        auto kv = parse_config(s);
        BotSortConfig c;
        c.track_high_thresh =
            static_cast<float>(cfg_get(kv, "track_high_thresh", c.track_high_thresh));
        c.track_low_thresh =
            static_cast<float>(cfg_get(kv, "track_low_thresh", c.track_low_thresh));
        c.new_track_thresh =
            static_cast<float>(cfg_get(kv, "new_track_thresh", c.new_track_thresh));
        c.match_thresh = static_cast<float>(cfg_get(kv, "match_thresh", c.match_thresh));
        c.second_match_thresh =
            static_cast<float>(cfg_get(kv, "second_match_thresh", c.second_match_thresh));
        c.unconfirmed_match_thresh = static_cast<float>(
            cfg_get(kv, "unconfirmed_match_thresh", c.unconfirmed_match_thresh));
        c.fuse_first_associate = cfg_get(kv, "fuse_first_associate", 0.0) != 0.0;
        c.with_reid = cfg_get(kv, "with_reid", 0.0) != 0.0;
        c.proximity_thresh =
            static_cast<float>(cfg_get(kv, "proximity_thresh", c.proximity_thresh));
        c.appearance_thresh =
            static_cast<float>(cfg_get(kv, "appearance_thresh", c.appearance_thresh));
        c.unconfirmed_emb_scale = static_cast<float>(
            cfg_get(kv, "unconfirmed_emb_scale", c.unconfirmed_emb_scale));
        c.ema_alpha = static_cast<float>(cfg_get(kv, "ema_alpha", c.ema_alpha));
        c.max_time_lost = static_cast<int>(cfg_get(kv, "max_time_lost", c.max_time_lost));
        c.nr_classes = std::max(static_cast<int>(cfg_get(kv, "nr_classes", c.nr_classes)), 1);
        c.std_weight_position =
            static_cast<float>(cfg_get(kv, "std_weight_position", c.std_weight_position));
        c.std_weight_velocity =
            static_cast<float>(cfg_get(kv, "std_weight_velocity", c.std_weight_velocity));
        c.use_cmc = cfg_get(kv, "use_cmc", 1.0) != 0.0;
        c.cmc_max_iter = static_cast<int>(cfg_get(kv, "cmc_max_iter", c.cmc_max_iter));
        c.cmc_scale = static_cast<float>(cfg_get(kv, "cmc_scale", c.cmc_scale));
        c.cmc_euclidean = cfg_get(kv, "cmc_euclidean", 0.0) != 0.0;
        c.capacity = static_cast<int>(cfg_get(kv, "capacity", c.capacity));
        return c;
    }
};

class BotSortCore {
  public:
    static constexpr int DX = 8;
    enum Status : int32_t { kEmpty = 0, kTracked = 1, kLost = 2 };

    explicit BotSortCore(const BotSortConfig& cfg)
        : cfg_(cfg),
          cmc_(cfg.cmc_euclidean ? 1 : 0, cfg.cmc_max_iter, cfg.cmc_scale) {
        XywhLayout layout;
        layout.swp = cfg.std_weight_position;
        layout.swv = cfg.std_weight_velocity;
        kf_ = KalmanBank<XywhLayout>(layout);
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
        const size_t NC = static_cast<size_t>(cfg_.nr_classes);
        mean_.assign(K * DX, 0.0f);
        cov_.assign(K * DX * DX, 0.0f);
        status_.assign(K, kEmpty);
        activated_.assign(K, 0);
        tid_.assign(K, 0);
        conf_.assign(K, 0.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        frame_id_.assign(K, 0);
        start_frame_.assign(K, 0);
        tracklet_len_.assign(K, 0);
        cls_scores_.assign(K * NC, 0.0f);
        cls_seen_.assign(K * NC, 0);
        has_feat_.assign(K, 0);
        smooth_feat_.clear();
        feat_dim_ = 0;
        cmc_.reset();
        frame_count_ = 0;
        next_id_ = 1;
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        return step_impl(dets, n, nullptr, 0, Warp2x3(), out);
    }

    // image-aware update: estimate camera motion, then track
    // (reference live API passes the frame; BotSort.apply cmc,
    // botsort.py:158-175)
    int64_t step_img(const float* dets, int64_t n, const uint8_t* img, int64_t H,
                     int64_t W, float* out) {
        Warp2x3 warp;
        if (cfg_.use_cmc && img) warp = cmc_.apply(img, H, W);
        return step_impl(dets, n, nullptr, 0, warp, out);
    }

    // appearance update with precomputed embeddings (the cached-embs
    // replay path; device botsort_step's embs input)
    int64_t step_embs(const float* dets, int64_t n, const float* embs,
                      int64_t feat_dim, float* out) {
        return step_impl(dets, n, embs, feat_dim, Warp2x3(), out);
    }

    // live path with both the frame (CMC) and embeddings (appearance)
    int64_t step_img_embs(const float* dets, int64_t n, const uint8_t* img,
                          int64_t H, int64_t W, const float* embs,
                          int64_t feat_dim, float* out) {
        Warp2x3 warp;
        if (cfg_.use_cmc && img) warp = cmc_.apply(img, H, W);
        return step_impl(dets, n, embs, feat_dim, warp, out);
    }

    int64_t step_warp(const float* dets, int64_t n, const Warp2x3& warp, float* out) {
        return step_impl(dets, n, nullptr, 0, warp, out);
    }

    int64_t step_impl(const float* dets, int64_t n, const float* embs,
                      int64_t feat_dim, const Warp2x3& warp, float* out) {
        const int K = cfg_.capacity;
        const int32_t frame = ++frame_count_;

        std::vector<char> first(static_cast<size_t>(n), 0), second(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j) {
            float c = dets[j * 6 + 4];
            first[static_cast<size_t>(j)] = c > cfg_.track_high_thresh;
            second[static_cast<size_t>(j)] =
                (c > cfg_.track_low_thresh) && (c < cfg_.track_high_thresh);
        }

        std::vector<char> pool(static_cast<size_t>(K), 0), unconf(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) {
            bool tracked_act = status_[i] == kTracked && activated_[i];
            bool lost = status_[i] == kLost;
            pool[i] = tracked_act || lost;
            unconf[i] = status_[i] == kTracked && !activated_[i];
            if (lost) {
                // lost tracks: size velocities zeroed before predict
                // (botsort_track.py:84-110)
                mean_[static_cast<size_t>(i) * DX + 6] = 0.0f;
                mean_[static_cast<size_t>(i) * DX + 7] = 0.0f;
            }
        }
        for (int i = 0; i < K; ++i) {
            if (!pool[i]) continue;
            kf_.predict(&mean_[static_cast<size_t>(i) * DX],
                        &cov_[static_cast<size_t>(i) * DX * DX]);
        }

        // camera motion compensation on pool + unconfirmed (multi_gmc,
        // botsort_track.py:118-133): mean <- kron(I4, R) mean + t,
        // cov <- T cov T^T
        if (!warp.identity()) {
            const float a = warp.m[0], b = warp.m[1], tx = warp.m[2];
            const float c = warp.m[3], d = warp.m[4], ty = warp.m[5];
            for (int i = 0; i < K; ++i) {
                if (!pool[i] && !unconf[i]) continue;
                float* m = &mean_[static_cast<size_t>(i) * DX];
                for (int pr = 0; pr < 4; ++pr) {
                    float x = m[pr * 2], y = m[pr * 2 + 1];
                    m[pr * 2] = a * x + b * y;
                    m[pr * 2 + 1] = c * x + d * y;
                }
                m[0] += tx;
                m[1] += ty;
                if (a != 1.0f || b != 0.0f || c != 0.0f || d != 1.0f) {
                    // rotate the covariance pair blocks: T = kron(I4, R)
                    float* P = &cov_[static_cast<size_t>(i) * DX * DX];
                    float TP[DX][DX];
                    for (int col = 0; col < DX; ++col)
                        for (int pr = 0; pr < 4; ++pr) {
                            float x = P[(pr * 2) * DX + col];
                            float y = P[(pr * 2 + 1) * DX + col];
                            TP[pr * 2][col] = a * x + b * y;
                            TP[pr * 2 + 1][col] = c * x + d * y;
                        }
                    for (int row = 0; row < DX; ++row)
                        for (int pr = 0; pr < 4; ++pr) {
                            float x = TP[row][pr * 2];
                            float y = TP[row][pr * 2 + 1];
                            P[row * DX + pr * 2] = a * x + b * y;
                            P[row * DX + pr * 2 + 1] = c * x + d * y;
                        }
                }
            }
        }

        // one shared IoU matrix over predicted track boxes
        std::vector<float> trk_xyxy(static_cast<size_t>(K) * 4);
        for (int i = 0; i < K; ++i)
            xywh_to_xyxy(&mean_[static_cast<size_t>(i) * DX], &trk_xyxy[static_cast<size_t>(i) * 4]);
        std::vector<float> iou(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
        for (int i = 0; i < K; ++i) {
            if (!pool[i] && !unconf[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                iou[static_cast<size_t>(i) * n + j] =
                    iou_xyxy(&trk_xyxy[static_cast<size_t>(i) * 4], &dets[j * 6]);
        }

        // --- appearance features (device botsort_step:226-262): L2-norm
        // det embeddings, cosine distance to the EMA smooth-feature bank
        const bool use_emb = cfg_.with_reid && embs != nullptr && feat_dim > 0;
        std::vector<float> feat;
        std::vector<float> emb_dist;  // (K, n) raw cosine distance
        if (use_emb) {
            if (feat_dim_ != feat_dim) {
                // first embedding seen fixes the bank's feature width
                feat_dim_ = feat_dim;
                smooth_feat_.assign(static_cast<size_t>(K) * feat_dim, 0.0f);
                std::fill(has_feat_.begin(), has_feat_.end(), static_cast<char>(0));
            }
            feat.assign(static_cast<size_t>(n) * feat_dim, 0.0f);
            for (int64_t j = 0; j < n; ++j) {
                double norm = 0.0;
                const float* e = embs + j * feat_dim;
                for (int64_t d = 0; d < feat_dim; ++d) norm += double(e[d]) * e[d];
                float inv = 1.0f / std::max(static_cast<float>(std::sqrt(norm)), 1e-12f);
                float* f = &feat[static_cast<size_t>(j) * feat_dim];
                for (int64_t d = 0; d < feat_dim; ++d) f[d] = e[d] * inv;
            }
            emb_dist.assign(static_cast<size_t>(K) * static_cast<size_t>(n), 1.0f);
            for (int i = 0; i < K; ++i) {
                if ((!pool[i] && !unconf[i]) || !has_feat_[i]) continue;
                const float* s = &smooth_feat_[static_cast<size_t>(i) * feat_dim];
                for (int64_t j = 0; j < n; ++j) {
                    double dot = 0.0;
                    const float* f = &feat[static_cast<size_t>(j) * feat_dim];
                    for (int64_t d = 0; d < feat_dim; ++d) dot += double(s[d]) * f[d];
                    emb_dist[static_cast<size_t>(i) * n + j] =
                        std::max(0.0f, 1.0f - static_cast<float>(dot));
                }
            }
        }

        // --- pass 1: pool vs high-conf dets
        std::vector<double> cost1(static_cast<size_t>(K) * static_cast<size_t>(n));
        for (int i = 0; i < K; ++i)
            for (int64_t j = 0; j < n; ++j) {
                double v = iou[static_cast<size_t>(i) * n + j];
                double c = cfg_.fuse_first_associate ? 1.0 - v * dets[j * 6 + 4] : 1.0 - v;
                if (use_emb) {
                    // emb term clipped at appearance_thresh and masked by
                    // the IoU proximity gate; cost = min(iou, emb)
                    // (botsort.py:285-321 / device :268-273)
                    double e = emb_dist[static_cast<size_t>(i) * n + j];
                    if (e > cfg_.appearance_thresh) e = 1.0;
                    if (1.0 - v > cfg_.proximity_thresh) e = 1.0;
                    c = std::min(c, e);
                }
                cost1[static_cast<size_t>(i) * n + j] = c;
            }
        std::vector<int32_t> r2c1 =
            masked_assignment(cost1, K, n, pool, first, cfg_.match_thresh);
        std::vector<char> det_taken(static_cast<size_t>(n), 0);
        for (int i = 0; i < K; ++i)
            if (r2c1[i] >= 0) det_taken[static_cast<size_t>(r2c1[i])] = 1;

        // --- pass 2: low-conf dets vs unmatched TRACKED slots, IoU only
        std::vector<char> r_tracked(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i)
            r_tracked[i] = pool[i] && r2c1[i] < 0 && status_[i] == kTracked;
        std::vector<double> cost2(static_cast<size_t>(K) * static_cast<size_t>(n));
        for (size_t idx = 0; idx < cost2.size(); ++idx)
            cost2[idx] = 1.0 - static_cast<double>(iou[idx]);
        std::vector<int32_t> r2c2 =
            masked_assignment(cost2, K, n, r_tracked, second, cfg_.second_match_thresh);

        // --- unconfirmed pass: fuse_score cost
        std::vector<char> u_first(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j)
            u_first[static_cast<size_t>(j)] =
                first[static_cast<size_t>(j)] && !det_taken[static_cast<size_t>(j)];
        std::vector<double> cost3(static_cast<size_t>(K) * static_cast<size_t>(n));
        for (int i = 0; i < K; ++i)
            for (int64_t j = 0; j < n; ++j) {
                double v = iou[static_cast<size_t>(i) * n + j];
                double c = 1.0 - v * dets[j * 6 + 4];
                if (use_emb) {
                    // unconfirmed pass scales emb distance down
                    // (device botsort_step:286-293)
                    double e = emb_dist[static_cast<size_t>(i) * n + j] /
                               cfg_.unconfirmed_emb_scale;
                    if (e > cfg_.appearance_thresh) e = 1.0;
                    if (1.0 - v > cfg_.proximity_thresh) e = 1.0;
                    c = std::min(c, e);
                }
                cost3[static_cast<size_t>(i) * n + j] = c;
            }
        std::vector<int32_t> r2c3 =
            masked_assignment(cost3, K, n, unconf, u_first, cfg_.unconfirmed_match_thresh);
        for (int i = 0; i < K; ++i)
            if (r2c3[i] >= 0) det_taken[static_cast<size_t>(r2c3[i])] = 1;

        // --- KF update + bookkeeping for matched slots
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c1[i] >= 0 ? r2c1[i] : (r2c2[i] >= 0 ? r2c2[i] : r2c3[i]);
            if (j < 0) continue;
            float z[4];
            xyxy_to_xywh(&dets[static_cast<int64_t>(j) * 6], z);
            kf_.update(&mean_[static_cast<size_t>(i) * DX],
                       &cov_[static_cast<size_t>(i) * DX * DX], z);
            if (use_emb && first[static_cast<size_t>(j)]) {
                // EMA appearance bank, renormalized (botsort_track.py:58-67);
                // second-stage dets carry no features
                float* s = &smooth_feat_[static_cast<size_t>(i) * feat_dim];
                const float* f = &feat[static_cast<size_t>(j) * feat_dim];
                if (has_feat_[i]) {
                    double norm = 0.0;
                    for (int64_t d = 0; d < feat_dim; ++d) {
                        s[d] = cfg_.ema_alpha * s[d] + (1.0f - cfg_.ema_alpha) * f[d];
                        norm += double(s[d]) * s[d];
                    }
                    float inv = 1.0f / std::max(static_cast<float>(std::sqrt(norm)), 1e-12f);
                    for (int64_t d = 0; d < feat_dim; ++d) s[d] *= inv;
                } else {
                    for (int64_t d = 0; d < feat_dim; ++d) s[d] = f[d];
                    has_feat_[i] = 1;
                }
            }
            bool was_tracked = status_[i] == kTracked;
            tracklet_len_[i] = was_tracked ? tracklet_len_[i] + 1 : 0;
            status_[i] = kTracked;
            activated_[i] = 1;
            conf_[i] = dets[static_cast<int64_t>(j) * 6 + 4];
            det_ind_[i] = static_cast<float>(j);
            frame_id_[i] = frame;
            cls_[i] = vote_cls(i, dets[static_cast<int64_t>(j) * 6 + 5],
                               dets[static_cast<int64_t>(j) * 6 + 4]);
        }

        for (int i = 0; i < K; ++i) {
            if (status_[i] == kLost && frame - frame_id_[i] > cfg_.max_time_lost)
                status_[i] = kEmpty;
            if (r_tracked[i] && r2c2[i] < 0) status_[i] = kLost;
            if (unconf[i] && r2c3[i] < 0) status_[i] = kEmpty;
        }

        // --- new tracks gated at new_track_thresh
        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!u_first[static_cast<size_t>(j)] || det_taken[static_cast<size_t>(j)]) continue;
            if (dets[j * 6 + 4] < cfg_.new_track_thresh) continue;
            while (free_cursor < K && status_[free_cursor] != kEmpty) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            float z[4];
            xyxy_to_xywh(&dets[j * 6], z);
            kf_.initiate(z, &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            status_[i] = kTracked;
            activated_[i] = frame == 1;
            tid_[i] = next_id_++;
            if (use_emb) {
                // new-track feature seed (STrack.__init__:41-44)
                float* s = &smooth_feat_[static_cast<size_t>(i) * feat_dim];
                const float* f = &feat[static_cast<size_t>(j) * feat_dim];
                for (int64_t d = 0; d < feat_dim; ++d) s[d] = f[d];
                has_feat_[i] = 1;
            } else {
                has_feat_[i] = 0;
            }
            conf_[i] = dets[j * 6 + 4];
            cls_[i] = dets[j * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            frame_id_[i] = frame;
            start_frame_[i] = frame;
            tracklet_len_[i] = 0;
            // fresh class-vote state seeded with the birth detection
            const size_t NC = static_cast<size_t>(cfg_.nr_classes);
            std::fill_n(&cls_scores_[static_cast<size_t>(i) * NC], NC, 0.0f);
            std::fill_n(&cls_seen_[static_cast<size_t>(i) * NC], NC, static_cast<char>(0));
            vote_cls(i, dets[j * 6 + 5], dets[j * 6 + 4]);
        }

        // --- duplicate suppression between tracked and lost sets
        for (int i = 0; i < K; ++i)
            xywh_to_xyxy(&mean_[static_cast<size_t>(i) * DX], &trk_xyxy[static_cast<size_t>(i) * 4]);
        std::vector<char> dup(static_cast<size_t>(K), 0);
        for (int a = 0; a < K; ++a) {
            if (status_[a] != kTracked) continue;
            for (int b = 0; b < K; ++b) {
                if (status_[b] != kLost) continue;
                float d = 1.0f - iou_xyxy(&trk_xyxy[static_cast<size_t>(a) * 4],
                                          &trk_xyxy[static_cast<size_t>(b) * 4]);
                if (d >= 0.15f) continue;
                int32_t ta = frame_id_[a] - start_frame_[a];
                int32_t tb = frame_id_[b] - start_frame_[b];
                if (ta <= tb) dup[a] = 1; else dup[b] = 1;
            }
        }
        for (int i = 0; i < K; ++i)
            if (dup[i]) status_[i] = kEmpty;

        // --- emit activated tracked slots in slot order
        int64_t m = 0;
        for (int i = 0; i < K; ++i) {
            if (status_[i] != kTracked || !activated_[i]) continue;
            float* row = out + m * 8;
            xywh_to_xyxy(&mean_[static_cast<size_t>(i) * DX], row);
            row[4] = static_cast<float>(tid_[i]);
            row[5] = conf_[i];
            row[6] = cls_[i];
            row[7] = det_ind_[i];
            ++m;
        }
        return m;
    }

    int capacity() const { return cfg_.capacity; }
    // id the next created track will carry in the output rows
    int64_t next_track_id() const { return next_id_; }

  private:
    // confidence-weighted class voting (botsort_track.py:69-83)
    float vote_cls(int i, float cls_det, float conf_det) {
        const int NC = cfg_.nr_classes;
        int ci = std::min(std::max(static_cast<int>(cls_det), 0), NC - 1);
        float* scores = &cls_scores_[static_cast<size_t>(i) * NC];
        char* seen = &cls_seen_[static_cast<size_t>(i) * NC];
        bool seen_before = seen[ci] != 0;
        scores[ci] += conf_det;
        seen[ci] = 1;
        if (!seen_before) return cls_det;
        int best = 0;
        for (int c = 1; c < NC; ++c)
            if (scores[c] > scores[best]) best = c;
        return static_cast<float>(best);
    }

    static void xywh_to_xyxy(const float* s, float* box) {
        box[0] = s[0] - s[2] / 2.0f;
        box[1] = s[1] - s[3] / 2.0f;
        box[2] = s[0] + s[2] / 2.0f;
        box[3] = s[1] + s[3] / 2.0f;
    }

    static void xyxy_to_xywh(const float* b, float* z) {
        z[0] = (b[0] + b[2]) / 2.0f;
        z[1] = (b[1] + b[3]) / 2.0f;
        z[2] = b[2] - b[0];
        z[3] = b[3] - b[1];
    }

    BotSortConfig cfg_;
    EccCmc cmc_;
    KalmanBank<XywhLayout> kf_{XywhLayout()};
    std::vector<float> mean_, cov_, conf_, cls_, det_ind_, cls_scores_;
    std::vector<float> smooth_feat_;  // (K, feat_dim) EMA appearance bank
    std::vector<int32_t> status_, tid_, frame_id_, start_frame_, tracklet_len_;
    std::vector<char> activated_, cls_seen_, has_feat_;
    int64_t feat_dim_ = 0;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

}  // namespace boxmot

#endif  // BOXMOT_BOTSORT_BANK_HPP
