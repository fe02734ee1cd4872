// BoostTrack as a fixed-capacity slot bank on the CPU.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/boosttrack.py (boosttrack_step): XYHR Kalman
// bank, DLO/DUO detection-confidence boosting (incl. the ++ variants
// rich-S / soft-boost / varying-threshold), and the multi-cue
// association cost iou + l_iou*conf*iou + l_mhd*MhSim +
// l_shape*conf*shape.  Reference semantics documented there
// (reference: boxmot/trackers/bbox/boosttrack/boosttrack.py:20-529,
// assoc.py:15-203).  Motion-only scope: no ReID embeddings and an
// identity camera warp — the appearance/CMC paths stay on the device
// programs.  The boost_* helpers are shared with the OccluBoost core
// (occluboost_bank.hpp).

#ifndef BOXMOT_BOOSTTRACK_BANK_HPP
#define BOXMOT_BOOSTTRACK_BANK_HPP

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

#include "ecc_cmc.hpp"
#include "kalman_bank.hpp"
#include "slot_common.hpp"

namespace boxmot {

constexpr float kMhLimit = 13.2767f;  // 99% chi2(4) limit (assoc.py:38)

struct BoostTrackConfig {
    float det_thresh = 0.5f;
    int max_age = 30;
    int min_hits = 3;
    float iou_threshold = 0.3f;
    float min_box_area = 10.0f;
    float aspect_ratio_thresh = 1.6f;
    float lambda_iou = 0.5f;
    float lambda_mhd = 0.25f;
    float lambda_shape = 0.25f;
    bool use_dlo_boost = true;
    bool use_duo_boost = true;
    float dlo_boost_coef = 0.65f;
    bool s_sim_corr = false;
    bool use_rich_s = false;
    bool use_sb = false;
    bool use_vt = false;
    bool use_cmc = true;
    int cmc_max_iter = 50;
    float cmc_scale = 0.15f;
    bool cmc_euclidean = false;
    int capacity = 256;

    void load(const std::unordered_map<std::string, double>& kv) {
        det_thresh = static_cast<float>(cfg_get(kv, "det_thresh", det_thresh));
        max_age = static_cast<int>(cfg_get(kv, "max_age", max_age));
        min_hits = static_cast<int>(cfg_get(kv, "min_hits", min_hits));
        iou_threshold = static_cast<float>(cfg_get(kv, "iou_threshold", iou_threshold));
        min_box_area = static_cast<float>(cfg_get(kv, "min_box_area", min_box_area));
        aspect_ratio_thresh =
            static_cast<float>(cfg_get(kv, "aspect_ratio_thresh", aspect_ratio_thresh));
        lambda_iou = static_cast<float>(cfg_get(kv, "lambda_iou", lambda_iou));
        lambda_mhd = static_cast<float>(cfg_get(kv, "lambda_mhd", lambda_mhd));
        lambda_shape = static_cast<float>(cfg_get(kv, "lambda_shape", lambda_shape));
        use_dlo_boost = cfg_get(kv, "use_dlo_boost", 1.0) != 0.0;
        use_duo_boost = cfg_get(kv, "use_duo_boost", 1.0) != 0.0;
        dlo_boost_coef = static_cast<float>(cfg_get(kv, "dlo_boost_coef", dlo_boost_coef));
        s_sim_corr = cfg_get(kv, "s_sim_corr", 0.0) != 0.0;
        use_rich_s = cfg_get(kv, "use_rich_s", 0.0) != 0.0;
        use_sb = cfg_get(kv, "use_sb", 0.0) != 0.0;
        use_vt = cfg_get(kv, "use_vt", 0.0) != 0.0;
        use_cmc = cfg_get(kv, "use_cmc", 1.0) != 0.0;
        cmc_max_iter = static_cast<int>(cfg_get(kv, "cmc_max_iter", cmc_max_iter));
        cmc_scale = static_cast<float>(cfg_get(kv, "cmc_scale", cmc_scale));
        cmc_euclidean = cfg_get(kv, "cmc_euclidean", 0.0) != 0.0;
        capacity = static_cast<int>(cfg_get(kv, "capacity", capacity));
    }

    static BoostTrackConfig from_string(const char* s) {
        BoostTrackConfig c;
        c.load(parse_config(s));
        return c;
    }
};

inline void xyhr_to_xyxy(const float* s, float* box) {
    float h = s[2], r = s[3];
    float w = r <= 0.0f ? 0.0f : r * h;
    box[0] = s[0] - w / 2.0f;
    box[1] = s[1] - h / 2.0f;
    box[2] = s[0] + w / 2.0f;
    box[3] = s[1] + h / 2.0f;
}

inline void xyxy_to_xyhr(const float* b, float* z) {
    float w = b[2] - b[0];
    float h = b[3] - b[1];
    z[0] = b[0] + w / 2.0f;
    z[1] = b[1] + h / 2.0f;
    z[2] = h;
    z[3] = w / (h + 1e-6f);
}

// MhDist_similarity (assoc.py:37-48): clamp, invert, per-track-column
// softmax over detections; masked entries excluded and zeroed.
inline std::vector<float> boost_mh_similarity(const std::vector<float>& md,
                                              int64_t n, int K,
                                              const std::vector<char>& det_valid,
                                              const std::vector<char>& active) {
    std::vector<float> sim(static_cast<size_t>(n) * static_cast<size_t>(K), 0.0f);
    for (int i = 0; i < K; ++i) {
        if (!active[i]) continue;
        float denom = 0.0f;
        for (int64_t j = 0; j < n; ++j) {
            if (!det_valid[static_cast<size_t>(j)]) continue;
            float m = md[static_cast<size_t>(j) * K + i];
            float e = std::exp(kMhLimit - std::min(m, kMhLimit));
            sim[static_cast<size_t>(j) * K + i] = e;
            denom += e;
        }
        denom = std::max(denom, 1e-12f);
        for (int64_t j = 0; j < n; ++j) {
            float m = md[static_cast<size_t>(j) * K + i];
            if (!det_valid[static_cast<size_t>(j)] || m > kMhLimit)
                sim[static_cast<size_t>(j) * K + i] = 0.0f;
            else
                sim[static_cast<size_t>(j) * K + i] /= denom;
        }
    }
    return sim;
}

inline float boost_shape_sim(bool s_sim_corr, float dw, float dh, const float* tb) {
    float tw = tb[2] - tb[0], th = tb[3] - tb[1];
    if (s_sim_corr)
        return std::exp(-(std::abs(dw - tw) / std::max(dw, tw) +
                          std::abs(dh - th) / std::max(dh, th)));
    // v1 quirk: both terms normalized by max(dw, tw) (assoc.py:15-23)
    return std::exp(-(std::abs(dw - tw) / std::max(dw, tw) +
                      std::abs(dh - th) / std::max(dw, tw)));
}

// soft-BIoU (assoc.py:73-110): both boxes buffered by the track conf
inline float boost_soft_biou(const float* db, const float* tb, float tc) {
    const float k1 = 0.25f, k2 = 0.5f;
    float e1w = (db[2] - db[0]) * (1 - tc) * k1;
    float e1h = (db[3] - db[1]) * (1 - tc) * k1;
    float e2w = (tb[2] - tb[0]) * (1 - tc) * k2;
    float e2h = (tb[3] - tb[1]) * (1 - tc) * k2;
    float a[4] = {db[0] - e1w, db[1] - e1h, db[2] + e1w, db[3] + e1h};
    float b[4] = {tb[0] - e2w, tb[1] - e2h, tb[2] + e2w, tb[3] + e2h};
    return iou_xyxy(a, b);
}

// DLO confidence boost (reference boosttrack.py:491-529)
inline void boost_dlo(const BoostTrackConfig& cfg, const float* dets, int64_t n,
                      std::vector<float>& conf, const std::vector<float>& trk_box,
                      const std::vector<float>& trk_conf,
                      const std::vector<float>& md,
                      const std::vector<char>& active,
                      const std::vector<int32_t>& tsu, int K) {
    std::vector<float> max_s(static_cast<size_t>(n), 0.0f);
    std::vector<char> all_valid(static_cast<size_t>(n), 1);
    std::vector<float> mh_sim;
    if (cfg.use_rich_s) mh_sim = boost_mh_similarity(md, n, K, all_valid, active);
    std::vector<float> vt_thr(static_cast<size_t>(K), 0.0f);
    if (cfg.use_vt)
        for (int i = 0; i < K; ++i)
            vt_thr[i] = std::max(0.95f - static_cast<float>(tsu[i] - 1), 0.8f);
    std::vector<char> vt_hit(static_cast<size_t>(n), 0);
    for (int64_t j = 0; j < n; ++j) {
        float dw = dets[j * 6 + 2] - dets[j * 6 + 0];
        float dh = dets[j * 6 + 3] - dets[j * 6 + 1];
        for (int i = 0; i < K; ++i) {
            if (!active[i]) continue;
            float S;
            if (cfg.use_rich_s) {
                S = (mh_sim[static_cast<size_t>(j) * K + i] +
                     boost_shape_sim(cfg.s_sim_corr, dw, dh, &trk_box[static_cast<size_t>(i) * 4]) +
                     boost_soft_biou(&dets[j * 6], &trk_box[static_cast<size_t>(i) * 4],
                                     trk_conf[i])) /
                    3.0f;
            } else {
                S = iou_xyxy(&dets[j * 6], &trk_box[static_cast<size_t>(i) * 4]);
            }
            max_s[static_cast<size_t>(j)] = std::max(max_s[static_cast<size_t>(j)], S);
            if (cfg.use_vt && S > vt_thr[i]) vt_hit[static_cast<size_t>(j)] = 1;
        }
    }
    for (int64_t j = 0; j < n; ++j) {
        float& c = conf[static_cast<size_t>(j)];
        if (!cfg.use_sb && !cfg.use_vt) {
            c = std::max(c, max_s[static_cast<size_t>(j)] * cfg.dlo_boost_coef);
            continue;
        }
        if (cfg.use_sb) {
            const float alpha = 0.65f;
            c = std::max(c, alpha * c + (1 - alpha) *
                                std::pow(max_s[static_cast<size_t>(j)], 1.5f));
        }
        if (cfg.use_vt && vt_hit[static_cast<size_t>(j)])
            c = std::max(c, cfg.det_thresh + 1e-5f);
    }
}

// DUO confidence boost: unexplained detections lifted to det_thresh with
// overlap suppression (reference boosttrack.py:452-489)
inline void boost_duo(const BoostTrackConfig& cfg, const float* dets, int64_t n,
                      std::vector<float>& conf, const std::vector<float>& md,
                      const std::vector<char>& active, int K) {
    std::vector<char> cand(static_cast<size_t>(n), 0);
    for (int64_t j = 0; j < n; ++j) {
        float md_min = std::numeric_limits<float>::infinity();
        for (int i = 0; i < K; ++i)
            if (active[i]) md_min = std::min(md_min, md[static_cast<size_t>(j) * K + i]);
        cand[static_cast<size_t>(j)] =
            md_min > kMhLimit && conf[static_cast<size_t>(j)] < cfg.det_thresh;
    }
    std::vector<float> diou_max(static_cast<size_t>(n), 0.0f);
    for (int64_t a = 0; a < n; ++a) {
        if (!cand[static_cast<size_t>(a)]) continue;
        for (int64_t b = 0; b < n; ++b) {
            if (a == b || !cand[static_cast<size_t>(b)]) continue;
            diou_max[static_cast<size_t>(a)] = std::max(
                diou_max[static_cast<size_t>(a)], iou_xyxy(&dets[a * 6], &dets[b * 6]));
        }
    }
    for (int64_t a = 0; a < n; ++a) {
        if (!cand[static_cast<size_t>(a)]) continue;
        bool boost;
        if (diou_max[static_cast<size_t>(a)] <= 0.3f) {
            boost = true;  // isolated
        } else {
            float local_max = conf[static_cast<size_t>(a)];
            for (int64_t b = 0; b < n; ++b) {
                if (b == a || !cand[static_cast<size_t>(b)]) continue;
                if (diou_max[static_cast<size_t>(b)] <= 0.3f) continue;
                if (iou_xyxy(&dets[a * 6], &dets[b * 6]) > 0.3f)
                    local_max = std::max(local_max, conf[static_cast<size_t>(b)]);
            }
            boost = conf[static_cast<size_t>(a)] >= local_max;
        }
        if (boost) conf[static_cast<size_t>(a)] = cfg.det_thresh + 1e-4f;
    }
}

// Build the multi-cue cost matrix (K, D) (assoc.py:156-203).  When
// emb_cost (n x K appearance similarity) is given, the ReID term is
// fused with l_emb = (1 + l_iou + l_shape + l_mhd) * emb_multiplier
// (device boost_cost, boxmot_tpu/trackers/boosttrack.py:293-308).
inline std::vector<double> boost_cost_kd(const BoostTrackConfig& cfg,
                                         const float* dets, int64_t n, int K,
                                         const std::vector<float>& iou_dk,
                                         const std::vector<float>& mh_sim,
                                         const std::vector<float>& conf,
                                         const std::vector<float>& trk_conf,
                                         const std::vector<float>& trk_box,
                                         const float* emb_cost = nullptr,
                                         float emb_multiplier = 1.5f) {
    std::vector<double> cost_kd(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0);
    const float lambda_emb =
        (1.0f + cfg.lambda_iou + cfg.lambda_shape + cfg.lambda_mhd) * emb_multiplier;
    for (int64_t j = 0; j < n; ++j) {
        float dw = dets[j * 6 + 2] - dets[j * 6 + 0];
        float dh = dets[j * 6 + 3] - dets[j * 6 + 1];
        for (int i = 0; i < K; ++i) {
            float iou = iou_dk[static_cast<size_t>(j) * K + i];
            float conf_dk = conf[static_cast<size_t>(j)] * trk_conf[i];
            if (iou < cfg.iou_threshold) conf_dk = 0.0f;
            float c = iou + cfg.lambda_iou * conf_dk * iou +
                      cfg.lambda_mhd * mh_sim[static_cast<size_t>(j) * K + i] +
                      cfg.lambda_shape * conf_dk *
                          boost_shape_sim(cfg.s_sim_corr, dw, dh,
                                          &trk_box[static_cast<size_t>(i) * 4]);
            if (emb_cost) c += lambda_emb * emb_cost[static_cast<size_t>(j) * K + i];
            cost_kd[static_cast<size_t>(i) * n + j] = c;
        }
    }
    return cost_kd;
}

// L2-normalize (n, feat_dim) det embeddings (device det_emb).
inline std::vector<float> boost_norm_embs(const float* embs, int64_t n,
                                          int64_t feat_dim) {
    std::vector<float> feat(static_cast<size_t>(n) * feat_dim, 0.0f);
    for (int64_t j = 0; j < n; ++j) {
        double norm = 0.0;
        const float* e = embs + j * feat_dim;
        for (int64_t d = 0; d < feat_dim; ++d) norm += double(e[d]) * e[d];
        float inv = 1.0f / std::max(static_cast<float>(std::sqrt(norm)), 1e-12f);
        float* f = &feat[static_cast<size_t>(j) * feat_dim];
        for (int64_t d = 0; d < feat_dim; ++d) f[d] = e[d] * inv;
    }
    return feat;
}

// EMA embedding update, renormalized (device boosttrack_step:378-384):
// emb <- norm(a * emb + (1 - a) * det_emb)
inline void boost_emb_ema(float* emb, const float* det_feat, int64_t feat_dim,
                          float a) {
    double norm = 0.0;
    for (int64_t d = 0; d < feat_dim; ++d) {
        emb[d] = a * emb[d] + (1.0f - a) * det_feat[d];
        norm += double(emb[d]) * emb[d];
    }
    float inv = 1.0f / std::max(static_cast<float>(std::sqrt(norm)), 1e-12f);
    for (int64_t d = 0; d < feat_dim; ++d) emb[d] *= inv;
}

// match() (assoc.py:113-120): unique-candidate shortcut on the combined
// cost at threshold, else full lapjv on -cost.
inline std::vector<int32_t> boost_match(float iou_threshold,
                                        const std::vector<double>& cost_kd,
                                        int64_t n, int K,
                                        const std::vector<char>& rows,
                                        const std::vector<char>& cols) {
    std::vector<int> row_cnt(static_cast<size_t>(K), 0), col_cnt(static_cast<size_t>(n), 0);
    std::vector<int32_t> row_cand(static_cast<size_t>(K), -1);
    for (int i = 0; i < K; ++i) {
        if (!rows[i]) continue;
        for (int64_t j = 0; j < n; ++j) {
            if (!cols[static_cast<size_t>(j)]) continue;
            if (cost_kd[static_cast<size_t>(i) * n + j] > iou_threshold) {
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
        std::vector<int32_t> result(static_cast<size_t>(K), -1);
        for (int i = 0; i < K; ++i)
            if (row_cnt[i] == 1) result[i] = row_cand[i];
        return result;
    }
    std::vector<double> neg(cost_kd.size());
    for (size_t idx = 0; idx < neg.size(); ++idx) neg[idx] = -cost_kd[idx];
    return full_assignment(neg, K, n, rows, cols);
}

// Diagonal-normalized Mahalanobis distance (D, K)
// (reference boosttrack.py:437-450)
inline std::vector<float> boost_mh_distance(const float* det_z, int64_t n, int K,
                                            int DX, const std::vector<float>& mean,
                                            const std::vector<float>& cov,
                                            const std::vector<char>& active) {
    std::vector<float> md(static_cast<size_t>(n) * static_cast<size_t>(K),
                          std::numeric_limits<float>::infinity());
    for (int i = 0; i < K; ++i) {
        if (!active[i]) continue;
        const float* m = &mean[static_cast<size_t>(i) * DX];
        const float* P = &cov[static_cast<size_t>(i) * DX * DX];
        float sinv[4];
        for (int d = 0; d < 4; ++d) sinv[d] = 1.0f / std::max(P[d * DX + d], 1e-12f);
        for (int64_t j = 0; j < n; ++j) {
            const float* z = &det_z[static_cast<size_t>(j) * 4];
            float s = 0.0f;
            for (int d = 0; d < 4; ++d) {
                float diff = z[d] - m[d];
                s += diff * diff * sinv[d];
            }
            md[static_cast<size_t>(j) * K + i] = s;
        }
    }
    return md;
}

// get_confidence (reference boosttrack.py:113-117)
inline float boost_track_confidence(int32_t age, int32_t tsu) {
    return age < 7 ? std::pow(0.9f, static_cast<float>(7 - age))
                   : std::pow(0.9f, static_cast<float>(tsu - 1));
}

// camera update: warp the state box corners and rebuild [x, y, h, r]
// (boosttrack.py:318-321 camera_update / camera_update_xyhr)
inline void boost_camera_update(std::vector<float>& mean, const std::vector<char>& active,
                                int K, int DX, const Warp2x3& warp) {
    if (warp.identity()) return;
    const float a = warp.m[0], b = warp.m[1], tx = warp.m[2];
    const float c = warp.m[3], d = warp.m[4], ty = warp.m[5];
    for (int i = 0; i < K; ++i) {
        if (!active[i]) continue;
        float* m = &mean[static_cast<size_t>(i) * DX];
        float box[4];
        xyhr_to_xyxy(m, box);
        float p1x = a * box[0] + b * box[1] + tx;
        float p1y = c * box[0] + d * box[1] + ty;
        float p2x = a * box[2] + b * box[3] + tx;
        float p2y = c * box[2] + d * box[3] + ty;
        float nb[4] = {p1x, p1y, p2x, p2y};
        xyxy_to_xyhr(nb, m);
    }
}

class BoostTrackCore {
  public:
    static constexpr int DX = 8;

    explicit BoostTrackCore(const BoostTrackConfig& cfg)
        : cfg_(cfg),
          cmc_(cfg.cmc_euclidean ? 1 : 0, cfg.cmc_max_iter, cfg.cmc_scale) {
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
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
        if (cfg_.use_cmc && img) warp = cmc_.apply(img, H, W);
        return step_warp(dets, n, warp, out);
    }

    int64_t step_warp(const float* dets, int64_t n, const Warp2x3& warp, float* out) {
        const int K = cfg_.capacity;
        const int32_t frame = ++frame_count_;

        // --- camera update before predict (boosttrack_step)
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

        std::vector<float> conf(static_cast<size_t>(n));
        std::vector<float> det_z(static_cast<size_t>(n) * 4);
        for (int64_t j = 0; j < n; ++j) {
            conf[static_cast<size_t>(j)] = dets[j * 6 + 4];
            xyxy_to_xyhr(&dets[j * 6], &det_z[static_cast<size_t>(j) * 4]);
        }

        std::vector<float> md =
            boost_mh_distance(det_z.data(), n, K, DX, mean_, cov_, active_);

        if (cfg_.use_dlo_boost)
            boost_dlo(cfg_, dets, n, conf, trk_box, trk_conf, md, active_, tsu_, K);
        if (cfg_.use_duo_boost && any_track)
            boost_duo(cfg_, dets, n, conf, md, active_, K);

        std::vector<char> first(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j)
            first[static_cast<size_t>(j)] = conf[static_cast<size_t>(j)] >= cfg_.det_thresh;

        // --- multi-cue cost (assoc.py:156-203), (D, K) det x track
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
            boost_cost_kd(cfg_, dets, n, K, iou_dk, mh_sim, conf, trk_conf, trk_box);

        std::vector<int32_t> r2c =
            boost_match(cfg_.iou_threshold, cost_kd, n, K, active_, first);
        std::vector<char> dm(static_cast<size_t>(n), 0), inv_det(static_cast<size_t>(n), 0);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c[i];
            if (j < 0) continue;
            if (iou_dk[static_cast<size_t>(j) * K + i] >= cfg_.iou_threshold) {
                dm[static_cast<size_t>(j)] = 1;
            } else {
                inv_det[static_cast<size_t>(j)] = 1;  // invalidated assignment
                r2c[i] = -1;
            }
        }

        // --- KF update + bookkeeping
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c[i];
            if (j < 0) continue;
            kf_.update(&mean_[static_cast<size_t>(i) * DX],
                       &cov_[static_cast<size_t>(i) * DX * DX],
                       &det_z[static_cast<size_t>(j) * 4]);
            hit_streak_[i] += 1;
            tsu_[i] = 0;
            conf_[i] = conf[static_cast<size_t>(j)];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
        }

        // --- new tracks: never-matched dets ascending first, then dets
        // whose assignment failed the validity gate (boosttrack.py:390-395)
        std::vector<int32_t> order;
        for (int64_t j = 0; j < n; ++j)
            if (first[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)] && !inv_det[static_cast<size_t>(j)])
                order.push_back(static_cast<int32_t>(j));
        for (int64_t j = 0; j < n; ++j)
            if (first[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)] && inv_det[static_cast<size_t>(j)])
                order.push_back(static_cast<int32_t>(j));
        int free_cursor = 0;
        const int32_t base_id = next_id_;
        int32_t assigned = 0;
        for (int32_t j : order) {
            while (free_cursor < K && active_[free_cursor]) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            kf_.initiate(&det_z[static_cast<size_t>(j) * 4],
                         &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            active_[i] = 1;
            tid_[i] = base_id + assigned++;
            conf_[i] = conf[static_cast<size_t>(j)];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            age_[i] = 0;
            tsu_[i] = 0;
            hit_streak_[i] = 0;
        }
        // next_id advances by the full new-det count even when slot
        // capacity truncates (boosttrack_step n_new)
        next_id_ = base_id + static_cast<int32_t>(order.size());

        // --- output (pre-removal active set), then removal
        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            if (tsu_[i] >= 1) continue;
            if (hit_streak_[i] < cfg_.min_hits && frame > cfg_.min_hits) continue;
            float box[4];
            xyhr_to_xyxy(&mean_[static_cast<size_t>(i) * DX], box);
            float w = box[2] - box[0], h = box[3] - box[1];
            if (w / std::max(h, 1e-12f) > cfg_.aspect_ratio_thresh) continue;
            if (w * h <= cfg_.min_box_area) continue;
            float* row = out + m_out * 8;
            std::copy(box, box + 4, row);
            row[4] = static_cast<float>(tid_[i]);
            row[5] = conf_[i];
            row[6] = cls_[i];
            row[7] = det_ind_[i];
            ++m_out;
        }
        for (int i = 0; i < K; ++i)
            if (active_[i] && tsu_[i] > cfg_.max_age) active_[i] = 0;
        return m_out;
    }

    int capacity() const { return cfg_.capacity; }
    // id the next created track will carry in the output rows
    int64_t next_track_id() const { return next_id_; }

  private:
    BoostTrackConfig cfg_;
    EccCmc cmc_;
    KalmanBank<XyhrLayout> kf_{XyhrLayout()};
    std::vector<float> mean_, cov_, conf_, cls_, det_ind_;
    std::vector<int32_t> age_, tsu_, hit_streak_, tid_;
    std::vector<char> active_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

}  // namespace boxmot

#endif  // BOXMOT_BOOSTTRACK_BANK_HPP
