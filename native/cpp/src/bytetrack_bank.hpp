// ByteTrack as a fixed-capacity slot bank on the CPU.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/bytetrack.py (bytetrack_step): same slot layout,
// the same three association passes over one shared IoU matrix, the
// same lifecycle ordering, and exact JV assignment in place of the
// device auction solver.  Reference semantics documented there
// (reference: boxmot/trackers/bbox/bytetrack/bytetrack.py:259-447).
// AABB only; the OBB path stays on the device program.

#ifndef BOXMOT_BYTETRACK_BANK_HPP
#define BOXMOT_BYTETRACK_BANK_HPP

#include <cstdint>
#include <vector>

#include "kalman_bank.hpp"
#include "obb_common.hpp"
#include "slot_common.hpp"

namespace boxmot {

enum SlotStatus : int32_t { kEmpty = 0, kTracked = 1, kLost = 2 };

struct ByteTrackConfig {
    float track_thresh = 0.45f;
    float match_thresh = 0.8f;
    float min_conf = 0.1f;
    float det_thresh = 0.45f;
    int max_time_lost = 25;
    int capacity = 256;
    float std_weight_position = 1.0f / 20.0f;
    float std_weight_velocity = 1.0f / 160.0f;

    static ByteTrackConfig from_string(const char* s) {
        auto kv = parse_config(s);
        ByteTrackConfig c;
        c.track_thresh = static_cast<float>(cfg_get(kv, "track_thresh", c.track_thresh));
        c.match_thresh = static_cast<float>(cfg_get(kv, "match_thresh", c.match_thresh));
        c.min_conf = static_cast<float>(cfg_get(kv, "min_conf", c.min_conf));
        c.det_thresh = static_cast<float>(cfg_get(kv, "det_thresh", c.track_thresh));
        c.max_time_lost = static_cast<int>(cfg_get(kv, "max_time_lost", c.max_time_lost));
        c.capacity = static_cast<int>(cfg_get(kv, "capacity", c.capacity));
        c.std_weight_position =
            static_cast<float>(cfg_get(kv, "std_weight_position", c.std_weight_position));
        c.std_weight_velocity =
            static_cast<float>(cfg_get(kv, "std_weight_velocity", c.std_weight_velocity));
        return c;
    }
};

class ByteTrackCore {
  public:
    static constexpr int DX = 8;

    explicit ByteTrackCore(const ByteTrackConfig& cfg) : cfg_(cfg) {
        XyahLayout layout;
        layout.swp = cfg.std_weight_position;
        layout.swv = cfg.std_weight_velocity;
        kf_ = KalmanBank<XyahLayout>(layout);
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
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
        frame_count_ = 0;
        next_id_ = 1;
    }

    // dets: (n, 6) [x1, y1, x2, y2, conf, cls] row-major.  Emits up to K
    // rows of [x1, y1, x2, y2, id, conf, cls, det_ind] into `out`
    // (capacity K * 8); returns the number of emitted rows.
    int64_t step(const float* dets, int64_t n, float* out) {
        const int K = cfg_.capacity;
        const int32_t frame = ++frame_count_;

        // --- split detections by confidence band
        std::vector<char> first(static_cast<size_t>(n), 0), second(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j) {
            float c = dets[j * 6 + 4];
            first[static_cast<size_t>(j)] = c > cfg_.track_thresh;
            second[static_cast<size_t>(j)] = (c > cfg_.min_conf) && (c < cfg_.track_thresh);
        }

        // --- slot pools
        std::vector<char> pool(static_cast<size_t>(K), 0), unconf(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) {
            bool tracked_act = status_[i] == kTracked && activated_[i];
            bool lost = status_[i] == kLost;
            pool[i] = tracked_act || lost;
            unconf[i] = status_[i] == kTracked && !activated_[i];
            // lost slots: zero the height velocity before predict
            // (STrack.multi_predict, reference bytetrack.py:64-82)
            if (lost) mean_[static_cast<size_t>(i) * DX + 7] = 0.0f;
        }

        // --- KF predict over the pool
        for (int i = 0; i < K; ++i) {
            if (!pool[i]) continue;
            kf_.predict(&mean_[static_cast<size_t>(i) * DX],
                        &cov_[static_cast<size_t>(i) * DX * DX]);
        }

        // --- one shared IoU matrix over predicted track boxes
        std::vector<float> trk_xyxy(static_cast<size_t>(K) * 4);
        for (int i = 0; i < K; ++i) xyah_to_xyxy(&mean_[static_cast<size_t>(i) * DX],
                                                 &trk_xyxy[static_cast<size_t>(i) * 4]);
        std::vector<float> iou(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
        for (int i = 0; i < K; ++i) {
            if (!pool[i] && !unconf[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                iou[static_cast<size_t>(i) * n + j] =
                    iou_xyxy(&trk_xyxy[static_cast<size_t>(i) * 4], &dets[j * 6]);
        }

        // --- pass 1: high-conf dets vs pool, fuse_score cost
        std::vector<double> cost1(static_cast<size_t>(K) * static_cast<size_t>(n));
        for (int i = 0; i < K; ++i)
            for (int64_t j = 0; j < n; ++j)
                cost1[static_cast<size_t>(i) * n + j] =
                    1.0 - static_cast<double>(iou[static_cast<size_t>(i) * n + j]) *
                              dets[j * 6 + 4];
        std::vector<int32_t> r2c1 =
            masked_assignment(cost1, K, n, pool, first, cfg_.match_thresh);
        std::vector<char> det_taken(static_cast<size_t>(n), 0);
        for (int i = 0; i < K; ++i)
            if (r2c1[i] >= 0) det_taken[static_cast<size_t>(r2c1[i])] = 1;

        // --- pass 2: low-conf dets vs pass-1-unmatched TRACKED slots
        std::vector<char> r_tracked(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i)
            r_tracked[i] = pool[i] && r2c1[i] < 0 && status_[i] == kTracked;
        std::vector<double> cost2(static_cast<size_t>(K) * static_cast<size_t>(n));
        for (size_t idx = 0; idx < cost2.size(); ++idx)
            cost2[idx] = 1.0 - static_cast<double>(iou[idx]);
        std::vector<int32_t> r2c2 = masked_assignment(cost2, K, n, r_tracked, second, 0.5);

        // --- unconfirmed pass: leftover high-conf dets vs unconfirmed slots
        std::vector<char> u_first(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j) u_first[static_cast<size_t>(j)] = first[static_cast<size_t>(j)] && !det_taken[static_cast<size_t>(j)];
        std::vector<int32_t> r2c3 = masked_assignment(cost1, K, n, unconf, u_first, 0.7);
        for (int i = 0; i < K; ++i)
            if (r2c3[i] >= 0) det_taken[static_cast<size_t>(r2c3[i])] = 1;

        // --- fused KF update + bookkeeping for matched slots
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c1[i] >= 0 ? r2c1[i] : (r2c2[i] >= 0 ? r2c2[i] : r2c3[i]);
            if (j < 0) continue;
            float z[4];
            xyxy_to_xyah(&dets[static_cast<int64_t>(j) * 6], z);
            kf_.update(&mean_[static_cast<size_t>(i) * DX],
                       &cov_[static_cast<size_t>(i) * DX * DX], z);
            bool was_tracked = status_[i] == kTracked;
            tracklet_len_[i] = was_tracked ? tracklet_len_[i] + 1 : 0;
            status_[i] = kTracked;
            activated_[i] = 1;
            conf_[i] = dets[static_cast<int64_t>(j) * 6 + 4];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            frame_id_[i] = frame;
        }

        for (int i = 0; i < K; ++i) {
            // aged-out lost tracks (pre-extension lost list semantics)
            if (status_[i] == kLost && frame - frame_id_[i] > cfg_.max_time_lost)
                status_[i] = kEmpty;
            // tracked slots unmatched in both passes become lost
            if (r_tracked[i] && r2c2[i] < 0) status_[i] = kLost;
            // unmatched unconfirmed tracks are removed
            if (unconf[i] && r2c3[i] < 0) status_[i] = kEmpty;
        }

        // --- new tracks from remaining high-conf dets, det order onto
        // free slots in slot order, ids next_id + rank
        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!u_first[static_cast<size_t>(j)] || det_taken[static_cast<size_t>(j)]) continue;
            if (dets[j * 6 + 4] < cfg_.det_thresh) continue;
            while (free_cursor < K && status_[free_cursor] != kEmpty) ++free_cursor;
            if (free_cursor >= K) break;  // capacity exhausted: drop (device program drops too)
            int i = free_cursor++;
            float z[4];
            xyxy_to_xyah(&dets[j * 6], z);
            kf_.initiate(z, &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            status_[i] = kTracked;
            activated_[i] = frame == 1;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * 6 + 4];
            cls_[i] = dets[j * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            frame_id_[i] = frame;
            start_frame_[i] = frame;
            tracklet_len_[i] = 0;
        }

        // --- duplicate suppression between tracked and lost sets
        // (remove_duplicate_stracks): keep the longer-lived track.
        for (int i = 0; i < K; ++i) xyah_to_xyxy(&mean_[static_cast<size_t>(i) * DX],
                                                 &trk_xyxy[static_cast<size_t>(i) * 4]);
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
            xyah_to_xyxy(&mean_[static_cast<size_t>(i) * DX], row);
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
    static void xyah_to_xyxy(const float* s, float* box) {
        float w = s[2] * s[3];
        box[0] = s[0] - w / 2.0f;
        box[1] = s[1] - s[3] / 2.0f;
        box[2] = s[0] + w / 2.0f;
        box[3] = s[1] + s[3] / 2.0f;
    }

    static void xyxy_to_xyah(const float* b, float* z) {
        float w = b[2] - b[0];
        float h = b[3] - b[1];
        z[0] = b[0] + w / 2.0f;
        z[1] = b[1] + h / 2.0f;
        z[2] = w / (h > 0.0f ? h : 1e-12f);
        z[3] = h;
    }

    ByteTrackConfig cfg_;
    KalmanBank<XyahLayout> kf_{XyahLayout()};
    std::vector<float> mean_, cov_, conf_, cls_, det_ind_;
    std::vector<int32_t> status_, tid_, frame_id_, start_frame_, tracklet_len_;
    std::vector<char> activated_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

// Oriented-box ByteTrack (bytetrack_step with cfg.is_obb=True): the
// XYWH-5 filter, rotated IoU for every pass, measurement alignment
// against the state, and x0.8 angular-velocity damping on observed
// updates.  Input rows are (n, 7) [cx, cy, w, h, angle, conf, cls];
// output rows are (m, 9) [cx, cy, w, h, angle, id, conf, cls, det_ind].
class ByteTrackObbCore {
  public:
    static constexpr int DX = 10;

    explicit ByteTrackObbCore(const ByteTrackConfig& cfg) : cfg_(cfg) {
        XywhObbLayout layout;
        layout.swp = cfg.std_weight_position;
        layout.swv = cfg.std_weight_velocity;
        kf_ = KalmanBank<XywhObbLayout>(layout);
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
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
        frame_count_ = 0;
        next_id_ = 1;
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        const int K = cfg_.capacity;
        const int32_t frame = ++frame_count_;
        const int DC = 7;  // det cols

        std::vector<char> first(static_cast<size_t>(n), 0), second(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j) {
            float c = dets[j * DC + 5];
            first[static_cast<size_t>(j)] = c > cfg_.track_thresh;
            second[static_cast<size_t>(j)] = (c > cfg_.min_conf) && (c < cfg_.track_thresh);
        }

        std::vector<char> pool(static_cast<size_t>(K), 0), unconf(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) {
            bool tracked_act = status_[i] == kTracked && activated_[i];
            bool lost = status_[i] == kLost;
            pool[i] = tracked_act || lost;
            unconf[i] = status_[i] == kTracked && !activated_[i];
            if (lost)  // zero size + angle velocities before predict
                for (int d = 7; d < 10; ++d)
                    mean_[static_cast<size_t>(i) * DX + d] = 0.0f;
        }
        for (int i = 0; i < K; ++i) {
            if (!pool[i]) continue;
            kf_.predict(&mean_[static_cast<size_t>(i) * DX],
                        &cov_[static_cast<size_t>(i) * DX * DX]);
        }

        // shared rotated-IoU matrix
        std::vector<float> iou(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
        for (int i = 0; i < K; ++i) {
            if (!pool[i] && !unconf[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                iou[static_cast<size_t>(i) * n + j] =
                    iou_obb(&mean_[static_cast<size_t>(i) * DX], &dets[j * DC]);
        }

        std::vector<double> cost1(static_cast<size_t>(K) * static_cast<size_t>(n));
        for (int i = 0; i < K; ++i)
            for (int64_t j = 0; j < n; ++j)
                cost1[static_cast<size_t>(i) * n + j] =
                    1.0 - static_cast<double>(iou[static_cast<size_t>(i) * n + j]) *
                              dets[j * DC + 5];
        std::vector<int32_t> r2c1 =
            masked_assignment(cost1, K, n, pool, first, cfg_.match_thresh);
        std::vector<char> det_taken(static_cast<size_t>(n), 0);
        for (int i = 0; i < K; ++i)
            if (r2c1[i] >= 0) det_taken[static_cast<size_t>(r2c1[i])] = 1;

        std::vector<char> r_tracked(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i)
            r_tracked[i] = pool[i] && r2c1[i] < 0 && status_[i] == kTracked;
        std::vector<double> cost2(static_cast<size_t>(K) * static_cast<size_t>(n));
        for (size_t idx = 0; idx < cost2.size(); ++idx)
            cost2[idx] = 1.0 - static_cast<double>(iou[idx]);
        std::vector<int32_t> r2c2 = masked_assignment(cost2, K, n, r_tracked, second, 0.5);

        std::vector<char> u_first(static_cast<size_t>(n), 0);
        for (int64_t j = 0; j < n; ++j)
            u_first[static_cast<size_t>(j)] =
                first[static_cast<size_t>(j)] && !det_taken[static_cast<size_t>(j)];
        std::vector<int32_t> r2c3 = masked_assignment(cost1, K, n, unconf, u_first, 0.7);
        for (int i = 0; i < K; ++i)
            if (r2c3[i] >= 0) det_taken[static_cast<size_t>(r2c3[i])] = 1;

        for (int i = 0; i < K; ++i) {
            int32_t j = r2c1[i] >= 0 ? r2c1[i] : (r2c2[i] >= 0 ? r2c2[i] : r2c3[i]);
            if (j < 0) continue;
            float* m = &mean_[static_cast<size_t>(i) * DX];
            float z[5];
            align_obb_to_ref(&dets[static_cast<int64_t>(j) * DC], m, z);
            kf_.update(m, &cov_[static_cast<size_t>(i) * DX * DX], z);
            m[9] *= 0.8f;  // angular velocity damping (xywh.py:183-184)
            bool was_tracked = status_[i] == kTracked;
            tracklet_len_[i] = was_tracked ? tracklet_len_[i] + 1 : 0;
            status_[i] = kTracked;
            activated_[i] = 1;
            conf_[i] = dets[static_cast<int64_t>(j) * DC + 5];
            cls_[i] = dets[static_cast<int64_t>(j) * DC + 6];
            det_ind_[i] = static_cast<float>(j);
            frame_id_[i] = frame;
        }

        for (int i = 0; i < K; ++i) {
            if (status_[i] == kLost && frame - frame_id_[i] > cfg_.max_time_lost)
                status_[i] = kEmpty;
            if (r_tracked[i] && r2c2[i] < 0) status_[i] = kLost;
            if (unconf[i] && r2c3[i] < 0) status_[i] = kEmpty;
        }

        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!u_first[static_cast<size_t>(j)] || det_taken[static_cast<size_t>(j)]) continue;
            if (dets[j * DC + 5] < cfg_.det_thresh) continue;
            while (free_cursor < K && status_[free_cursor] != kEmpty) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            float z[5];
            std::copy(&dets[j * DC], &dets[j * DC + 5], z);
            z[4] = wrap_angle(z[4]);
            kf_.initiate(z, &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            status_[i] = kTracked;
            activated_[i] = frame == 1;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * DC + 5];
            cls_[i] = dets[j * DC + 6];
            det_ind_[i] = static_cast<float>(j);
            frame_id_[i] = frame;
            start_frame_[i] = frame;
            tracklet_len_[i] = 0;
        }

        // duplicate suppression (rotated IoU, keep the longer-lived track)
        std::vector<char> dup(static_cast<size_t>(K), 0);
        for (int a = 0; a < K; ++a) {
            if (status_[a] != kTracked) continue;
            for (int b = 0; b < K; ++b) {
                if (status_[b] != kLost) continue;
                float d = 1.0f - iou_obb(&mean_[static_cast<size_t>(a) * DX],
                                         &mean_[static_cast<size_t>(b) * DX]);
                if (d >= 0.15f) continue;
                int32_t ta = frame_id_[a] - start_frame_[a];
                int32_t tb = frame_id_[b] - start_frame_[b];
                if (ta <= tb) dup[a] = 1; else dup[b] = 1;
            }
        }
        for (int i = 0; i < K; ++i)
            if (dup[i]) status_[i] = kEmpty;

        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (status_[i] != kTracked || !activated_[i]) continue;
            float* row = out + m_out * 9;
            std::copy(&mean_[static_cast<size_t>(i) * DX],
                      &mean_[static_cast<size_t>(i) * DX + 5], row);
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
    enum SlotStatusObb : int32_t { kEmpty = 0, kTracked = 1, kLost = 2 };

    ByteTrackConfig cfg_;
    KalmanBank<XywhObbLayout> kf_{XywhObbLayout()};
    std::vector<float> mean_, cov_, conf_, cls_, det_ind_;
    std::vector<int32_t> status_, tid_, frame_id_, start_frame_, tracklet_len_;
    std::vector<char> activated_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

}  // namespace boxmot

#endif  // BOXMOT_BYTETRACK_BANK_HPP
