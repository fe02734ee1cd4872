// OccluBoost (the flagship tracker) as a fixed-capacity slot bank.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/occluboost.py (occluboost_step), including the
// full appearance path: BoostTrack's multi-cue association with the
// fused ReID term, the emb>=0.75 validity rescue, the ReID-only
// recovery pass, the appearance-gated low-confidence second pass,
// online GTA recovery against alive-but-drifted tracks, graveyard
// burial/resurrection with id reuse, and gap-interpolation row
// accumulation (flushed raw through the C ABI; GP smoothing stays
// host-side, exactly like the device flush_gta_rows split).  Also:
// BotSort-style confirmation states, AMS gain damping, and vectorized
// duplicate suppression.  Embeddings arrive via step_embs /
// step_img_embs (the cached-embs replay and live paths); steps without
// embeddings run the motion-only configuration, mirroring the device
// wrapper's `with_reid and reid_model is not None` gate.  Reference:
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
    // appearance path (device OccluBoostConfig defaults)
    bool with_reid = true;
    float recovery_appearance_thresh = 0.99f;
    float recovery_iou_thresh = 0.1f;
    int recovery_max_age = 1;
    float feat_alpha = 0.95f;
    float second_appearance_thresh = 0.5f;
    float lambda_emb_multiplier = 1.5f;
    bool gta_enabled = true;
    float gta_appearance_thresh = 0.5f;
    int gta_min_track_length = 5;
    bool gta_interpolate = true;
    int gta_max_gap = 60;

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
        c.with_reid = cfg_get(kv, "with_reid", 1.0) != 0.0;
        c.recovery_appearance_thresh = static_cast<float>(
            cfg_get(kv, "recovery_appearance_thresh", c.recovery_appearance_thresh));
        c.recovery_iou_thresh =
            static_cast<float>(cfg_get(kv, "recovery_iou_thresh", c.recovery_iou_thresh));
        c.recovery_max_age =
            static_cast<int>(cfg_get(kv, "recovery_max_age", c.recovery_max_age));
        c.feat_alpha = static_cast<float>(cfg_get(kv, "feat_alpha", c.feat_alpha));
        c.second_appearance_thresh = static_cast<float>(
            cfg_get(kv, "second_appearance_thresh", c.second_appearance_thresh));
        c.lambda_emb_multiplier = static_cast<float>(
            cfg_get(kv, "lambda_emb_multiplier", c.lambda_emb_multiplier));
        c.gta_enabled = cfg_get(kv, "gta_enabled", 1.0) != 0.0;
        c.gta_appearance_thresh = static_cast<float>(
            cfg_get(kv, "gta_appearance_thresh", c.gta_appearance_thresh));
        c.gta_min_track_length =
            static_cast<int>(cfg_get(kv, "gta_min_track_length", c.gta_min_track_length));
        c.gta_interpolate = cfg_get(kv, "gta_interpolate", 1.0) != 0.0;
        c.gta_max_gap = static_cast<int>(cfg_get(kv, "gta_max_gap", c.gta_max_gap));
        return c;
    }
};

class OccluBoostCore {
  public:
    static constexpr int DX = 8;
    // device program buffer bounds (occluboost.py:63-66)
    static constexpr int GRAVE_SLOTS = 64;
    static constexpr int GAP_BUF = 4096;
    static constexpr int MAX_RES_PER_FRAME = 8;
    static constexpr int MAX_GAP_FILL = 64;

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
        feat_dim_ = 0;
        emb_.clear();
        g_valid_.assign(GRAVE_SLOTS, 0);
        g_emb_.clear();
        g_box_.assign(GRAVE_SLOTS * 4, 0.0f);
        g_frame_.assign(GRAVE_SLOTS, 0);
        g_conf_.assign(GRAVE_SLOTS, 0.0f);
        g_cls_.assign(GRAVE_SLOTS, 0.0f);
        g_gid_.assign(GRAVE_SLOTS, 0);
        gap_rows_.clear();
        cmc_.reset();
        frame_count_ = 0;
        next_id_ = 1;
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        return step_impl(dets, n, Warp2x3(), nullptr, 0, out);
    }

    int64_t step_img(const float* dets, int64_t n, const uint8_t* img, int64_t H,
                     int64_t W, float* out) {
        Warp2x3 warp;
        if (cfg_.boost.use_cmc && img) warp = cmc_.apply(img, H, W);
        return step_impl(dets, n, warp, nullptr, 0, out);
    }

    // cached-embs replay path (device occluboost_step's embs input)
    int64_t step_embs(const float* dets, int64_t n, const float* embs,
                      int64_t feat_dim, float* out) {
        return step_impl(dets, n, Warp2x3(), embs, feat_dim, out);
    }

    // live path with both the frame (CMC) and embeddings (appearance)
    int64_t step_img_embs(const float* dets, int64_t n, const uint8_t* img,
                          int64_t H, int64_t W, const float* embs,
                          int64_t feat_dim, float* out) {
        Warp2x3 warp;
        if (cfg_.boost.use_cmc && img) warp = cmc_.apply(img, H, W);
        return step_impl(dets, n, warp, embs, feat_dim, out);
    }

    int64_t step_warp(const float* dets, int64_t n, const Warp2x3& warp, float* out) {
        return step_impl(dets, n, warp, nullptr, 0, out);
    }

    int64_t step_impl(const float* dets, int64_t n, const Warp2x3& warp,
                      const float* embs, int64_t feat_dim, float* out) {
        const BoostTrackConfig& bc = cfg_.boost;
        const int K = bc.capacity;
        const int32_t frame = ++frame_count_;
        // appearance is active only when embeddings actually arrive this
        // step (same per-step gate as the botsort core; the device wrapper
        // equivalent is `with_reid and reid_model is not None` — the
        // native core's reid model IS the caller-supplied embs)
        const bool with_reid = cfg_.with_reid && embs != nullptr && feat_dim > 0;
        if (with_reid) ensure_feat_dim(feat_dim);
        const int64_t F = feat_dim_;
        std::vector<float> det_emb;
        if (with_reid) det_emb = boost_norm_embs(embs, n, F);

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

        // --- pass 1: BoostTrack multi-cue association (+ fused ReID term)
        std::vector<float> iou_dk(static_cast<size_t>(n) * static_cast<size_t>(K), 0.0f);
        for (int64_t j = 0; j < n; ++j) {
            if (!first[static_cast<size_t>(j)]) continue;
            for (int i = 0; i < K; ++i)
                if (active_[i])
                    iou_dk[static_cast<size_t>(j) * K + i] =
                        iou_xyxy(&dets[j * 6], &trk_box[static_cast<size_t>(i) * 4]);
        }
        // emb_cost (n x K) cosine similarity against the stored (already
        // normalized) slot embeddings — ungated, like the device full
        // det_emb @ state.emb.T (occluboost.py:304)
        std::vector<float> emb_cost;
        if (with_reid) {
            emb_cost.assign(static_cast<size_t>(n) * K, 0.0f);
            for (int64_t j = 0; j < n; ++j) {
                const float* de = &det_emb[static_cast<size_t>(j) * F];
                for (int i = 0; i < K; ++i) {
                    const float* te = &emb_[static_cast<size_t>(i) * F];
                    double s = 0.0;
                    for (int64_t d = 0; d < F; ++d) s += double(de[d]) * te[d];
                    emb_cost[static_cast<size_t>(j) * K + i] = static_cast<float>(s);
                }
            }
        }
        std::vector<float> mh_sim = boost_mh_similarity(md, n, K, first, active_);
        std::vector<double> cost_kd = boost_cost_kd(
            bc, dets, n, K, iou_dk, mh_sim, conf, trk_conf, trk_box,
            with_reid ? emb_cost.data() : nullptr, cfg_.lambda_emb_multiplier);
        std::vector<int32_t> r2c =
            boost_match(bc.iou_threshold, cost_kd, n, K, active_, first);
        std::vector<char> dm(static_cast<size_t>(n), 0), inv_det(static_cast<size_t>(n), 0);
        std::vector<char> unmatched_trk0(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c[i];
            bool valid = false;
            if (j >= 0) {
                float iou = iou_dk[static_cast<size_t>(j) * K + i];
                valid = iou >= bc.iou_threshold;
                // appearance rescue: emb >= 0.75 AND iou >= thr/2
                // (occluboost.py:335-337)
                if (!valid && with_reid &&
                    emb_cost[static_cast<size_t>(j) * K + i] >= 0.75f &&
                    iou >= bc.iou_threshold / 2.0f)
                    valid = true;
            }
            if (j >= 0 && valid) {
                dm[static_cast<size_t>(j)] = 1;
            } else {
                if (j >= 0) {
                    inv_det[static_cast<size_t>(j)] = 1;
                    r2c[i] = -1;
                }
                unmatched_trk0[i] = active_[i];
            }
        }

        // --- KF + AMS + emb-EMA + confirmation bookkeeping, pass 1.
        // alpha_emb per det: 0.95 + 0.05*(1 - trust) (occluboost.py:391-392)
        for (int i = 0; i < K; ++i) {
            if (r2c[i] < 0) continue;
            int32_t j = r2c[i];
            float trust = (conf[static_cast<size_t>(j)] - bc.det_thresh) /
                          (1.0f - bc.det_thresh);
            float alpha_emb = 0.95f + 0.05f * (1.0f - trust);
            apply_update(i, j, dets, det_z, conf, det_emb, alpha_emb, with_reid);
        }

        std::vector<char> det_unmatched(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j)
            det_unmatched[static_cast<size_t>(j)] =
                first[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)];

        // --- ReID-only recovery pass (occluboost.py:407-426): gated LSA
        // maximizing similarity with the pass-1-updated slot embeddings
        if (with_reid) {
            std::vector<char> elig(static_cast<size_t>(K), 0);
            for (int i = 0; i < K; ++i)
                elig[i] = unmatched_trk0[i] && tsu_[i] <= cfg_.recovery_max_age;
            std::vector<int32_t> r2c_rec = gated_lsa_max(
                elig, det_unmatched, n, [&](int i, int64_t j) -> float {
                    float sim = slot_det_sim(i, j, det_emb, F);
                    if (sim < cfg_.recovery_appearance_thresh) return -1.0f;
                    if (iou_xyxy(&trk_box[static_cast<size_t>(i) * 4], &dets[j * 6]) <
                        cfg_.recovery_iou_thresh)
                        return -1.0f;
                    return sim;
                });
            for (int i = 0; i < K; ++i) {
                if (r2c_rec[i] < 0) continue;
                apply_update(i, r2c_rec[i], dets, det_z, conf, det_emb,
                             cfg_.feat_alpha, with_reid);
                dm[static_cast<size_t>(r2c_rec[i])] = 1;
                det_unmatched[static_cast<size_t>(r2c_rec[i])] = 0;
            }
        }

        // --- appearance-gated low-confidence second pass (occluboost.py:428-451)
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
                    double c = iou < cfg_.second_iou_thresh ? 1.0 : 1.0 - iou;
                    if (with_reid &&
                        slot_det_sim(i, j, det_emb, F) < cfg_.second_appearance_thresh)
                        c = 1.0;
                    cost2[static_cast<size_t>(i) * n + j] = c;
                }
            }
            std::vector<int32_t> r2c2 = masked_assignment(cost2, K, n, elig2, second, 1.0);
            for (int i = 0; i < K; ++i)
                if (r2c2[i] >= 0)
                    apply_update(i, r2c2[i], dets, det_z, conf, det_emb,
                                 cfg_.feat_alpha, with_reid);
        }

        // --- GTA pure-appearance recovery (occluboost.py:453-471)
        if (cfg_.gta_enabled && with_reid) {
            std::vector<char> elig_g(static_cast<size_t>(K), 0);
            for (int i = 0; i < K; ++i)
                elig_g[i] = unmatched_trk0[i] && tsu_[i] <= cfg_.gta_max_gap &&
                            age_[i] >= cfg_.gta_min_track_length;
            std::vector<int32_t> r2c_g = gated_lsa_max(
                elig_g, det_unmatched, n, [&](int i, int64_t j) -> float {
                    float sim = slot_det_sim(i, j, det_emb, F);
                    return sim < cfg_.gta_appearance_thresh ? -1.0f : sim;
                });
            for (int i = 0; i < K; ++i) {
                if (r2c_g[i] < 0) continue;
                apply_update(i, r2c_g[i], dets, det_z, conf, det_emb,
                             cfg_.feat_alpha, with_reid);
                dm[static_cast<size_t>(r2c_g[i])] = 1;
                det_unmatched[static_cast<size_t>(r2c_g[i])] = 0;
            }
        }

        // --- GTA graveyard resurrection (occluboost.py:473-495): rows are
        // dets here — match unmatched high-conf dets against buried embs
        std::vector<char> res_det(static_cast<size_t>(n), 0);
        std::vector<int32_t> res_gid(static_cast<size_t>(n), 0);
        std::vector<int32_t> res_gslot(static_cast<size_t>(n), -1);
        if (cfg_.gta_enabled && with_reid) {
            std::vector<char> res_cand(static_cast<size_t>(n), 0);
            for (int64_t j = 0; j < n; ++j)
                res_cand[static_cast<size_t>(j)] =
                    det_unmatched[static_cast<size_t>(j)] &&
                    conf[static_cast<size_t>(j)] >= cfg_.new_track_thresh;
            std::vector<double> cost_r(
                static_cast<size_t>(n) * GRAVE_SLOTS, 1.0);
            std::vector<float> sim_r(static_cast<size_t>(n) * GRAVE_SLOTS, -1.0f);
            for (int64_t j = 0; j < n; ++j) {
                if (!res_cand[static_cast<size_t>(j)]) continue;
                const float* de = &det_emb[static_cast<size_t>(j) * F];
                for (int g = 0; g < GRAVE_SLOTS; ++g) {
                    if (!g_valid_[g]) continue;
                    const float* ge = &g_emb_[static_cast<size_t>(g) * F];
                    double s = 0.0;
                    for (int64_t d = 0; d < F; ++d) s += double(de[d]) * ge[d];
                    float sim = static_cast<float>(s);
                    if (sim < cfg_.gta_appearance_thresh) sim = -1.0f;
                    sim_r[static_cast<size_t>(j) * GRAVE_SLOTS + g] = sim;
                    cost_r[static_cast<size_t>(j) * GRAVE_SLOTS + g] = -double(sim);
                }
            }
            std::vector<char> gvalid(g_valid_.begin(), g_valid_.end());
            std::vector<int32_t> d2g =
                full_assignment(cost_r, n, GRAVE_SLOTS, res_cand, gvalid);
            for (int64_t j = 0; j < n; ++j) {
                int32_t g = d2g[static_cast<size_t>(j)];
                if (g < 0 || sim_r[static_cast<size_t>(j) * GRAVE_SLOTS + g] <= 0.0f)
                    continue;
                res_det[static_cast<size_t>(j)] = 1;
                res_gid[static_cast<size_t>(j)] = g_gid_[g];
                res_gslot[static_cast<size_t>(j)] = g;
                g_valid_[g] = 0;  // consume the graveyard entry
            }
        }

        // --- new tracks (incl. resurrected ids): slots fill in ascending
        // det order over ALL new dets; fresh ids follow the reference's
        // unmatched ordering (invalidated assignments last), resurrected
        // dets reuse their graveyard id (occluboost.py:497-537)
        std::vector<int32_t> new_dets;
        for (int64_t j = 0; j < n; ++j)
            if (first[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)] &&
                conf[static_cast<size_t>(j)] >= cfg_.new_track_thresh)
                new_dets.push_back(static_cast<int32_t>(j));
        int32_t n_fresh = 0;
        for (int32_t j : new_dets)
            if (!res_det[static_cast<size_t>(j)]) ++n_fresh;
        // fresh-id rank: fresh dets ordered by (inv_det, det index)
        const int32_t base_id = next_id_;
        int free_cursor = 0;
        for (size_t a = 0; a < new_dets.size(); ++a) {
            int32_t j = new_dets[a];
            while (free_cursor < K && active_[free_cursor]) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            int32_t tid;
            if (res_det[static_cast<size_t>(j)]) {
                tid = res_gid[static_cast<size_t>(j)];
            } else {
                int32_t ka = j + (inv_det[static_cast<size_t>(j)] ? static_cast<int32_t>(n) : 0);
                int32_t rank = 0;
                for (int32_t jb : new_dets) {
                    if (res_det[static_cast<size_t>(jb)]) continue;
                    int32_t kb = jb + (inv_det[static_cast<size_t>(jb)] ? static_cast<int32_t>(n) : 0);
                    if (kb < ka) ++rank;
                }
                tid = base_id + rank;
            }
            kf_.initiate(&det_z[static_cast<size_t>(j) * 4],
                         &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            active_[i] = 1;
            tid_[i] = tid;
            conf_[i] = conf[static_cast<size_t>(j)];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            age_[i] = 0;
            tsu_[i] = 0;
            hit_streak_[i] = 0;
            ams_count_[i] = 0;
            if (with_reid)
                std::memcpy(&emb_[static_cast<size_t>(i) * F],
                            &det_emb[static_cast<size_t>(j) * F],
                            static_cast<size_t>(F) * sizeof(float));
            is_activated_[i] =
                res_det[static_cast<size_t>(j)] ||  // resurrected: instant
                conf[static_cast<size_t>(j)] >= cfg_.instant_confirm_thresh ||
                cfg_.confirm_hits <= 1;
        }
        // the device program advances next_id by the FRESH det count even
        // when slot capacity truncates (occluboost_step n_fresh)
        next_id_ = base_id + n_fresh;

        // --- gap interpolation rows for resurrections (occluboost.py:539-592):
        // resurrected dets in ascending det order, capped at
        // MAX_RES_PER_FRAME; t in [1, gap) capped at MAX_GAP_FILL;
        // buffer capped at GAP_BUF (overflow rows dropped)
        if (cfg_.gta_enabled && with_reid && cfg_.gta_interpolate) {
            int taken = 0;
            for (int64_t j = 0; j < n && taken < MAX_RES_PER_FRAME; ++j) {
                if (!res_det[static_cast<size_t>(j)]) continue;
                ++taken;
                int g = res_gslot[static_cast<size_t>(j)];
                int32_t death = g_frame_[g];
                int32_t gap = frame - death;
                if (gap <= 1 || gap > cfg_.gta_max_gap) continue;
                const float* last_box = &g_box_[static_cast<size_t>(g) * 4];
                const float* cur_box = &dets[j * 6];
                for (int32_t t = 1; t < MAX_GAP_FILL && t < gap; ++t) {
                    if (static_cast<int>(gap_rows_.size() / 9) >= GAP_BUF) break;
                    float a = static_cast<float>(t) / static_cast<float>(gap);
                    gap_rows_.push_back(static_cast<float>(death + t));
                    gap_rows_.push_back(static_cast<float>(res_gid[static_cast<size_t>(j)]));
                    for (int d = 0; d < 4; ++d)
                        gap_rows_.push_back((1.0f - a) * last_box[d] + a * cur_box[d]);
                    gap_rows_.push_back(g_conf_[g]);
                    gap_rows_.push_back(g_cls_[g]);
                    gap_rows_.push_back(-1.0f);
                }
            }
        }

        // --- emission + vectorized duplicate suppression
        // (occluboost.py:594-634)
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
        // ones at tentative_max_age (occluboost.py:636-639); eligible dead
        // tracks bury into the graveyard (occluboost.py:641-663)
        if (cfg_.gta_enabled && with_reid) {
            // evict stale graveyard entries first
            for (int g = 0; g < GRAVE_SLOTS; ++g)
                if (g_valid_[g] && frame - g_frame_[g] > cfg_.gta_max_gap)
                    g_valid_[g] = 0;
        }
        int gfree_cursor = 0;
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            bool alive = tsu_[i] <= bc.max_age &&
                         (is_activated_[i] || tsu_[i] <= cfg_.tentative_max_age);
            if (alive) continue;
            active_[i] = 0;
            if (cfg_.gta_enabled && with_reid && age_[i] >= cfg_.gta_min_track_length) {
                while (gfree_cursor < GRAVE_SLOTS && g_valid_[gfree_cursor]) ++gfree_cursor;
                if (gfree_cursor >= GRAVE_SLOTS) continue;
                int g = gfree_cursor++;
                std::memcpy(&g_emb_[static_cast<size_t>(g) * F],
                            &emb_[static_cast<size_t>(i) * F],
                            static_cast<size_t>(F) * sizeof(float));
                std::memcpy(&g_box_[static_cast<size_t>(g) * 4],
                            &out_box[static_cast<size_t>(i) * 4], 4 * sizeof(float));
                g_frame_[g] = frame;
                g_conf_[g] = conf_[i];
                g_cls_[g] = cls_[i];
                g_gid_[g] = tid_[i];
                g_valid_[g] = 1;
            }
        }
        return m_out;
    }

    int capacity() const { return cfg_.boost.capacity; }
    // id the next created track will carry in the output rows
    int64_t next_track_id() const { return next_id_; }

    // accumulated gap-interpolation rows, 9 floats each
    // [frame, id, x1, y1, x2, y2, conf, cls, -1]; flushed raw — GP
    // smoothing stays host-side (device flush_gta_rows split)
    int64_t pending_rows() const { return static_cast<int64_t>(gap_rows_.size() / 9); }
    int64_t flush_rows(float* out, int64_t max_rows) {
        int64_t m = std::min<int64_t>(pending_rows(), max_rows);
        if (out && m > 0)
            std::memcpy(out, gap_rows_.data(), static_cast<size_t>(m) * 9 * sizeof(float));
        gap_rows_.clear();
        return m;
    }

  private:
    void ensure_feat_dim(int64_t feat_dim) {
        if (feat_dim == feat_dim_) return;
        // dim change resets stored features (never happens on the real
        // pipelines: one ReID model per run)
        feat_dim_ = feat_dim;
        emb_.assign(static_cast<size_t>(cfg_.boost.capacity) * feat_dim_, 0.0f);
        g_emb_.assign(static_cast<size_t>(GRAVE_SLOTS) * feat_dim_, 0.0f);
    }

    float slot_det_sim(int i, int64_t j, const std::vector<float>& det_emb,
                       int64_t F) const {
        const float* te = &emb_[static_cast<size_t>(i) * F];
        const float* de = &det_emb[static_cast<size_t>(j) * F];
        double s = 0.0;
        for (int64_t d = 0; d < F; ++d) s += double(te[d]) * de[d];
        return static_cast<float>(s);
    }

    // device _gated_lsa_max: full assignment maximizing similarity over
    // gated pairs; assignments whose similarity is not > 0 are dropped
    template <class SimFn>
    std::vector<int32_t> gated_lsa_max(const std::vector<char>& rows,
                                       const std::vector<char>& cols, int64_t n,
                                       SimFn&& sim_fn) const {
        const int K = cfg_.boost.capacity;
        std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n), 1.0);
        std::vector<float> sim(static_cast<size_t>(K) * static_cast<size_t>(n), -1.0f);
        for (int i = 0; i < K; ++i) {
            if (!rows[i]) continue;
            for (int64_t j = 0; j < n; ++j) {
                if (!cols[static_cast<size_t>(j)]) continue;
                float s = sim_fn(i, j);
                sim[static_cast<size_t>(i) * n + j] = s;
                cost[static_cast<size_t>(i) * n + j] = -double(s);
            }
        }
        std::vector<int32_t> r2c = full_assignment(cost, K, n, rows, cols);
        for (int i = 0; i < K; ++i)
            if (r2c[i] >= 0 && sim[static_cast<size_t>(i) * n + r2c[i]] <= 0.0f)
                r2c[i] = -1;
        return r2c;
    }

    // KF + AMS + emb-EMA + bookkeeping for one matched slot (apply_update
    // in occluboost_step)
    void apply_update(int i, int32_t j, const float* dets,
                      const std::vector<float>& det_z,
                      const std::vector<float>& conf,
                      const std::vector<float>& det_emb, float alpha_emb,
                      bool with_reid) {
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
        if (with_reid)
            boost_emb_ema(&emb_[static_cast<size_t>(i) * feat_dim_],
                          &det_emb[static_cast<size_t>(j) * feat_dim_], feat_dim_,
                          alpha_emb);
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
    // appearance state
    int64_t feat_dim_ = 0;
    std::vector<float> emb_;  // (K, F) normalized slot features
    // graveyard (GRAVE_SLOTS entries)
    std::vector<char> g_valid_;
    std::vector<float> g_emb_, g_box_, g_conf_, g_cls_;
    std::vector<int32_t> g_frame_, g_gid_;
    std::vector<float> gap_rows_;  // flat 9-col gap-fill rows
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

}  // namespace boxmot

#endif  // BOXMOT_OCCLUBOOST_BANK_HPP
