// Sam2Mot — hybrid bbox + mask tracker on the CPU.
//
// Step-for-step mirror of boxmot_tpu/trackers/sam2mot.py (itself a
// host-side numpy tracker; its hot math is ragged mask set-ops that
// don't fit fixed-shape XLA programs): three-stage matching (high/low
// conf IoU on velocity-predicted boxes, last-matched-bbox recovery),
// cross-object-interaction occlusion resolution via mask IoU with
// confidence mean/variance arbitration, frame-out recovery,
// untracked-region gating for new tracks, and the RELIABLE/PENDING/
// SUSPICIOUS/LOST/FRAME_OUT states.  Reference:
// boxmot/trackers/hybrid/sam2mot/sam2mot.py:25-723.

#ifndef BOXMOT_SAM2MOT_BANK_HPP
#define BOXMOT_SAM2MOT_BANK_HPP

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

#include "slot_common.hpp"

namespace boxmot {

struct Sam2MotConfig {
    float det_thresh = 0.3f;
    int max_age = 60;
    int min_hits = 1;
    int tolerance_frames = 30;
    int memory_window = 25;
    float tau_r = 0.8f;
    float tau_p = 0.5f;
    float tau_s = 0.3f;
    float density_threshold = 0.9f;
    float second_stage_iou_threshold = 0.3f;
    float frame_out_d_thre = 0.6f;
    float miou_threshold = 0.8f;
    float untracked_ratio_threshold = 0.5f;
    float new_track_thresh = 0.5f;
    int capacity = 256;  // emission buffer bound

    static Sam2MotConfig from_string(const char* s) {
        auto kv = parse_config(s);
        Sam2MotConfig c;
        c.det_thresh = static_cast<float>(cfg_get(kv, "det_thresh", c.det_thresh));
        c.max_age = static_cast<int>(cfg_get(kv, "max_age", c.max_age));
        c.min_hits = static_cast<int>(cfg_get(kv, "min_hits", c.min_hits));
        c.tolerance_frames =
            static_cast<int>(cfg_get(kv, "tolerance_frames", c.tolerance_frames));
        c.memory_window = static_cast<int>(cfg_get(kv, "memory_window", c.memory_window));
        c.tau_r = static_cast<float>(cfg_get(kv, "tau_r", c.tau_r));
        c.tau_p = static_cast<float>(cfg_get(kv, "tau_p", c.tau_p));
        c.tau_s = static_cast<float>(cfg_get(kv, "tau_s", c.tau_s));
        c.density_threshold =
            static_cast<float>(cfg_get(kv, "density_threshold", c.density_threshold));
        c.second_stage_iou_threshold = static_cast<float>(
            cfg_get(kv, "second_stage_iou_threshold", c.second_stage_iou_threshold));
        c.frame_out_d_thre =
            static_cast<float>(cfg_get(kv, "frame_out_d_thre", c.frame_out_d_thre));
        c.miou_threshold =
            static_cast<float>(cfg_get(kv, "miou_threshold", c.miou_threshold));
        c.untracked_ratio_threshold = static_cast<float>(
            cfg_get(kv, "untracked_ratio_threshold", c.untracked_ratio_threshold));
        c.new_track_thresh =
            static_cast<float>(cfg_get(kv, "new_track_thresh", c.new_track_thresh));
        c.capacity = static_cast<int>(cfg_get(kv, "capacity", c.capacity));
        return c;
    }
};

class Sam2MotCore {
  public:
    enum State : int { kReliable, kPending, kSuspicious, kLost, kFrameOut };

    explicit Sam2MotCore(const Sam2MotConfig& cfg) : cfg_(cfg) { reset(); }

    void reset() {
        tracks_.clear();
        next_id_ = 1;
        frame_count_ = 0;
    }

    int capacity() const { return cfg_.capacity; }
    // id the next created track will carry in the output rows
    int64_t next_track_id() const { return next_id_; }

    // dets (n, 6) in frame coords; masks nullable (n, mH, mW) uint8;
    // fH/fW: frame size (<=0 means the mask grid); out (capacity, 8);
    // out_masks nullable (capacity, mH, mW).  Returns rows written.
    int64_t step_masks(const float* dets, int64_t n, const uint8_t* masks,
                       int64_t mH, int64_t mW, int64_t fH, int64_t fW,
                       float* out, uint8_t* out_masks) {
        ++frame_count_;
        const int32_t frame_id = frame_count_;
        const bool has_masks = masks != nullptr && mH > 0 && mW > 0;
        const size_t msz = static_cast<size_t>(mH) * mW;
        // frame -> mask grid mapping (letterbox-style, sam2mot.py:261-272)
        const double H = fH > 0 ? static_cast<double>(fH) : std::max<double>(mH, 1);
        const double W = fW > 0 ? static_cast<double>(fW) : std::max<double>(mW, 1);
        const double sc = std::min(mH / H, mW / W);
        const double pad_x = (mW - static_cast<int>(W * sc)) / 2.0;
        const double pad_y = (mH - static_cast<int>(H * sc)) / 2.0;

        auto to_mask = [&](const float* b, int& x1, int& y1, int& x2, int& y2) {
            x1 = std::max(0, static_cast<int>(b[0] * sc + pad_x));
            y1 = std::max(0, static_cast<int>(b[1] * sc + pad_y));
            x2 = std::min(static_cast<int>(mW), static_cast<int>(b[2] * sc + pad_x));
            y2 = std::min(static_cast<int>(mH), static_cast<int>(b[3] * sc + pad_y));
        };

        for (auto& t : tracks_) {
            t.prev_bbox = t.bbox_vec();
            t.age += 1;
        }

        std::vector<Track*> active, frame_out, normal;
        for (auto& t : tracks_)
            if (t.state != kLost) active.push_back(&t);
        for (Track* t : active) {
            if (t->last_matched_frame >= 0 && t->last_matched_frame <= frame_id - 10 &&
                !t->is_dense && t->age > 1) {
                t->state = kFrameOut;
                t->mask.clear();
                frame_out.push_back(t);
            } else {
                normal.push_back(t);
            }
        }

        // --- two-stage matching + last-matched-bbox recovery
        std::vector<std::pair<int, int>> all_matches, second_matches;
        std::vector<int> u_dets;
        two_stage(dets, n, normal, all_matches, u_dets, second_matches);
        auto is_second = [&](int d, int t) {
            for (auto& p : second_matches)
                if (p.first == d && p.second == t) return true;
            return false;
        };

        std::vector<int> matched_ids;
        std::vector<std::pair<Track*, int>> reconstruct;
        for (auto [det_idx, trk_idx] : all_matches) {
            Track* t = normal[static_cast<size_t>(trk_idx)];
            const float* b = dets + static_cast<int64_t>(det_idx) * 6;
            float conf = b[4];
            float density = det_density(dets, n, det_idx);
            t->last_matched_density = density;
            t->is_dense = density > cfg_.frame_out_d_thre;
            t->last_matched_frame = frame_id;
            std::copy(b, b + 4, t->last_matched_bbox);
            t->has_last_matched = true;
            matched_ids.push_back(t->id);

            if (is_second(det_idx, trk_idx)) {
                if (density < cfg_.density_threshold) reconstruct.emplace_back(t, det_idx);
            } else {
                if (!t->mask.empty() && has_masks) {
                    // crop the mask memory to the new bbox
                    int x1, y1, x2, y2;
                    to_mask(b, x1, y1, x2, y2);
                    std::vector<uint8_t> cropped(t->mask.size(), 0);
                    if (t->mask.size() == msz)
                        for (int y = y1; y < y2; ++y)
                            for (int x = x1; x < x2; ++x)
                                cropped[static_cast<size_t>(y) * mW + x] =
                                    t->mask[static_cast<size_t>(y) * mW + x];
                    t->mask = std::move(cropped);
                }
                if (t->state == kPending && conf > cfg_.tau_r &&
                    density < cfg_.density_threshold)
                    reconstruct.emplace_back(t, det_idx);
            }

            float nv[4];
            for (int k = 0; k < 4; ++k) nv[k] = b[k] - t->bbox[k];
            if (t->has_velocity)
                for (int k = 0; k < 4; ++k)
                    t->velocity[k] = 0.6f * t->velocity[k] + 0.4f * nv[k];
            else
                std::copy(nv, nv + 4, t->velocity);
            t->has_velocity = true;
            std::copy(b, b + 4, t->bbox);
            t->confidence = conf;
            push_conf(*t, conf);
            t->last_seen_frame = frame_id;
            t->lost_frames = 0;
            t->cls = b[5];
            t->det_ind = det_idx;
            if (has_masks) copy_mask(*t, masks, det_idx, msz);
            int ns = classify(conf);
            if (ns != kLost) t->state = ns;
        }

        // --- cross-object interaction: occluded member drops its mask
        if (active.size() > 1) coi(active, msz);

        for (auto [t, det_idx] : reconstruct) {
            const float* b = dets + static_cast<int64_t>(det_idx) * 6;
            if (has_masks) copy_mask(*t, masks, det_idx, msz);
            t->state = kReliable;
            std::copy(b, b + 4, t->bbox);
            t->confidence = b[4];
            push_conf(*t, b[4]);
            t->det_ind = det_idx;
        }

        for (auto& t : tracks_) {
            bool matched = false;
            for (int id : matched_ids) matched |= id == t.id;
            if (!matched) {
                t.lost_frames += 1;
                if (t.lost_frames > cfg_.tolerance_frames) t.state = kLost;
            }
        }

        // --- stage 3: frame-out recovery against last matched boxes
        if (!frame_out.empty() && !u_dets.empty()) {
            const int64_t nd = static_cast<int64_t>(u_dets.size());
            const int64_t nt = static_cast<int64_t>(frame_out.size());
            std::vector<double> cost(static_cast<size_t>(nd * nt), 1.0);
            for (int64_t r = 0; r < nd; ++r)
                for (int64_t c = 0; c < nt; ++c) {
                    Track* t = frame_out[static_cast<size_t>(c)];
                    if (!t->has_last_matched) continue;
                    float iou = iou_xyxy(
                        dets + static_cast<int64_t>(u_dets[static_cast<size_t>(r)]) * 6,
                        t->last_matched_bbox);
                    if (iou > 0) cost[static_cast<size_t>(r * nt + c)] = 1.0 - iou;
                }
            std::vector<char> ones_r(static_cast<size_t>(nd), 1), ones_c(static_cast<size_t>(nt), 1);
            std::vector<int32_t> r2c = full_assignment(cost, nd, nt, ones_r, ones_c);
            std::vector<int> taken;
            for (int64_t r = 0; r < nd; ++r) {
                int32_t c = r2c[static_cast<size_t>(r)];
                if (c < 0 || cost[static_cast<size_t>(r * nt + c)] >= 1.0) continue;
                int det_idx = u_dets[static_cast<size_t>(r)];
                Track* t = frame_out[static_cast<size_t>(c)];
                const float* b = dets + static_cast<int64_t>(det_idx) * 6;
                float density = det_density(dets, n, det_idx);
                t->state = kReliable;
                std::copy(b, b + 4, t->bbox);
                t->confidence = b[4];
                push_conf(*t, b[4]);
                t->last_seen_frame = frame_id;
                t->lost_frames = 0;
                t->last_matched_frame = frame_id;
                std::copy(b, b + 4, t->last_matched_bbox);
                t->has_last_matched = true;
                t->last_matched_density = density;
                t->is_dense = density > cfg_.frame_out_d_thre;
                t->cls = b[5];
                t->det_ind = det_idx;
                if (has_masks) copy_mask(*t, masks, det_idx, msz);
                matched_ids.push_back(t->id);
                taken.push_back(det_idx);
            }
            std::vector<int> rest;
            for (int d : u_dets)
                if (std::find(taken.begin(), taken.end(), d) == taken.end())
                    rest.push_back(d);
            u_dets = rest;
        }

        // --- new tracks gated by the untracked region
        if (!u_dets.empty()) {
            std::vector<uint8_t> untracked(msz, 1);
            if (msz) {
                for (auto& t : tracks_)
                    if (!t.mask.empty() && t.state != kLost && t.mask.size() == msz)
                        for (size_t p = 0; p < msz; ++p)
                            if (t.mask[p]) untracked[p] = 0;
                for (Track* t : active) {
                    const float* gb = nullptr;
                    bool mask_empty = t->mask.empty() ||
                        std::none_of(t->mask.begin(), t->mask.end(),
                                     [](uint8_t v) { return v != 0; });
                    if (mask_empty)
                        gb = t->has_last_matched ? t->last_matched_bbox : t->bbox;
                    else if (t->is_dense && t->has_last_matched)
                        gb = t->last_matched_bbox;
                    if (gb) {
                        int x1, y1, x2, y2;
                        to_mask(gb, x1, y1, x2, y2);
                        for (int y = y1; y < y2; ++y)
                            for (int x = x1; x < x2; ++x)
                                untracked[static_cast<size_t>(y) * mW + x] = 0;
                    }
                }
            }
            for (int det_idx : u_dets) {
                const float* b = dets + static_cast<int64_t>(det_idx) * 6;
                if (b[4] < cfg_.new_track_thresh) continue;
                if (msz) {
                    int x1, y1, x2, y2;
                    to_mask(b, x1, y1, x2, y2);
                    long area = static_cast<long>(x2 - x1) * (y2 - y1);
                    if (area <= 0) continue;
                    long free_px = 0;
                    for (int y = y1; y < y2; ++y)
                        for (int x = x1; x < x2; ++x)
                            free_px += untracked[static_cast<size_t>(y) * mW + x];
                    if (static_cast<float>(free_px) / area <= cfg_.untracked_ratio_threshold)
                        continue;
                }
                float density = det_density(dets, n, det_idx);
                Track t;
                t.id = next_id_++;
                std::copy(b, b + 4, t.bbox);
                t.confidence = b[4];
                t.state = kReliable;
                t.age = 1;
                t.last_seen_frame = frame_id;
                t.init_frame = frame_id;
                t.last_matched_frame = frame_id;
                std::copy(b, b + 4, t.last_matched_bbox);
                t.has_last_matched = true;
                t.last_matched_density = density;
                t.is_dense = density > cfg_.frame_out_d_thre;
                t.cls = b[5];
                t.det_ind = det_idx;
                if (has_masks) copy_mask(t, masks, det_idx, msz);
                push_conf(t, b[4]);
                tracks_.push_back(std::move(t));
                matched_ids.push_back(tracks_.back().id);
            }
        }

        tracks_.erase(
            std::remove_if(tracks_.begin(), tracks_.end(),
                           [&](const Track& t) {
                               return t.lost_frames > cfg_.tolerance_frames;
                           }),
            tracks_.end());

        int64_t m_out = 0;
        for (auto& t : tracks_) {
            if (m_out >= cfg_.capacity) break;
            bool matched = false;
            for (int id : matched_ids) matched |= id == t.id;
            if (!matched) continue;
            if (t.age < cfg_.min_hits && frame_count_ > cfg_.min_hits) continue;
            float* row = out + m_out * 8;
            std::copy(t.bbox, t.bbox + 4, row);
            row[4] = static_cast<float>(t.id);
            row[5] = t.confidence;
            row[6] = t.cls;
            row[7] = static_cast<float>(t.det_ind);
            if (out_masks && msz) {
                uint8_t* dst = out_masks + m_out * msz;
                if (t.mask.size() == msz)
                    std::memcpy(dst, t.mask.data(), msz);
                else
                    std::memset(dst, 0, msz);
            }
            ++m_out;
        }
        return m_out;
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        return step_masks(dets, n, nullptr, 0, 0, 0, 0, out, nullptr);
    }

  private:
    struct Track {
        int id = 0;
        float bbox[4] = {};
        std::vector<uint8_t> mask;
        float confidence = 0.0f;
        int state = kReliable;
        int lost_frames = 0;
        int age = 0;
        std::deque<float> conf_history;
        int last_seen_frame = 0;
        int init_frame = 0;
        std::vector<float> prev_bbox;
        float velocity[4] = {};
        bool has_velocity = false;
        bool is_dense = false;
        int last_matched_frame = -1;
        float last_matched_bbox[4] = {};
        bool has_last_matched = false;
        float last_matched_density = 0.0f;
        bool skip_memory_current = false;
        float cls = 0.0f;
        int det_ind = -1;

        std::vector<float> bbox_vec() const { return {bbox[0], bbox[1], bbox[2], bbox[3]}; }
    };

    int classify(float conf) const {
        if (conf > cfg_.tau_r) return kReliable;
        if (conf > cfg_.tau_p) return kPending;
        if (conf > cfg_.tau_s) return kSuspicious;
        return kLost;
    }

    void push_conf(Track& t, float conf) {
        t.conf_history.push_back(conf);
        while (static_cast<int>(t.conf_history.size()) > cfg_.memory_window)
            t.conf_history.pop_front();
    }

    static void copy_mask(Track& t, const uint8_t* masks, int det_idx, size_t msz) {
        t.mask.assign(masks + static_cast<size_t>(det_idx) * msz,
                      masks + static_cast<size_t>(det_idx + 1) * msz);
    }

    static float det_density(const float* dets, int64_t n, int i) {
        const float* b = dets + static_cast<int64_t>(i) * 6;
        float area = std::max((b[2] - b[0]) * (b[3] - b[1]), 1e-6f);
        float acc = 0.0f;
        for (int64_t j = 0; j < n; ++j) {
            if (j == i) continue;
            const float* o = dets + j * 6;
            float ix1 = std::max(b[0], o[0]), iy1 = std::max(b[1], o[1]);
            float ix2 = std::min(b[2], o[2]), iy2 = std::min(b[3], o[3]);
            acc += std::max(0.0f, ix2 - ix1) * std::max(0.0f, iy2 - iy1);
        }
        return acc / area;
    }

    static float mask_iou(const std::vector<uint8_t>& a, const std::vector<uint8_t>& b) {
        if (a.empty() || b.empty() || a.size() != b.size()) return 0.0f;
        long inter = 0, uni = 0;
        for (size_t p = 0; p < a.size(); ++p) {
            bool av = a[p] != 0, bv = b[p] != 0;
            inter += av && bv;
            uni += av || bv;
        }
        return static_cast<float>(inter) / std::max(static_cast<float>(uni), 1e-6f);
    }

    void coi(std::vector<Track*>& active, size_t msz) {
        (void)msz;
        std::vector<int> skip;
        for (size_t i = 0; i < active.size(); ++i) {
            Track* a = active[i];
            if (a->mask.empty() || a->state == kFrameOut) continue;
            for (size_t j = i + 1; j < active.size(); ++j) {
                Track* b = active[j];
                if (b->mask.empty() || b->state == kFrameOut) continue;
                if (a->bbox[2] <= b->bbox[0] || b->bbox[2] <= a->bbox[0]) continue;
                if (a->bbox[3] <= b->bbox[1] || b->bbox[3] <= a->bbox[1]) continue;
                if (mask_iou(a->mask, b->mask) <= cfg_.miou_threshold) continue;
                auto stats = [](const Track* t, float& mean, float& var) {
                    size_t cnt = t->conf_history.size();
                    size_t start = cnt > 10 ? cnt - 10 : 0;
                    size_t m = cnt - start;
                    if (m < 2) { mean = 0.0f; var = 0.0f; return; }
                    double s = 0.0;
                    for (size_t k = start; k < cnt; ++k) s += t->conf_history[k];
                    mean = static_cast<float>(s / m);
                    double v = 0.0;
                    for (size_t k = start; k < cnt; ++k) {
                        double d = t->conf_history[k] - mean;
                        v += d * d;
                    }
                    var = static_cast<float>(v / m);
                };
                float mean_a, var_a, mean_b, var_b;
                stats(a, mean_a, var_a);
                stats(b, mean_b, var_b);
                Track* occluded;
                if (std::abs(mean_a - mean_b) >= std::abs(var_a - var_b))
                    occluded = mean_a < mean_b ? a : b;
                else
                    occluded = var_a > var_b ? a : b;
                occluded->skip_memory_current = true;
                if (std::find(skip.begin(), skip.end(), occluded->id) == skip.end())
                    skip.push_back(occluded->id);
            }
        }
        for (Track* t : active)
            if (t->skip_memory_current &&
                std::find(skip.begin(), skip.end(), t->id) != skip.end()) {
                t->mask.clear();
                t->skip_memory_current = false;
            }
    }

    void two_stage(const float* dets, int64_t n, std::vector<Track*>& tracks,
                   std::vector<std::pair<int, int>>& matches,
                   std::vector<int>& u_dets,
                   std::vector<std::pair<int, int>>& second) {
        const int64_t nt = static_cast<int64_t>(tracks.size());
        matches.clear();
        second.clear();
        u_dets.clear();
        if (n == 0 || nt == 0) {
            for (int64_t i = 0; i < n; ++i) u_dets.push_back(static_cast<int>(i));
            return;
        }
        std::vector<float> trk_boxes(static_cast<size_t>(nt) * 4);
        for (int64_t j = 0; j < nt; ++j) {
            Track* t = tracks[static_cast<size_t>(j)];
            for (int k = 0; k < 4; ++k)
                trk_boxes[static_cast<size_t>(j) * 4 + k] =
                    t->bbox[k] + (t->has_velocity ? t->velocity[k] : 0.0f);
        }
        std::vector<int> high, low;
        for (int64_t i = 0; i < n; ++i)
            (dets[i * 6 + 4] >= cfg_.det_thresh ? high : low).push_back(static_cast<int>(i));
        std::vector<char> det_taken(static_cast<size_t>(n), 0), trk_taken(static_cast<size_t>(nt), 0);

        auto lsa_pass = [&](const std::vector<int>& det_ids,
                            const std::vector<int>& trk_ids, bool low_gate) {
            const int64_t nd = static_cast<int64_t>(det_ids.size());
            const int64_t ntk = static_cast<int64_t>(trk_ids.size());
            if (nd == 0 || ntk == 0) return;
            std::vector<double> cost(static_cast<size_t>(nd * ntk), 1.0);
            std::vector<float> iou(static_cast<size_t>(nd * ntk), 0.0f);
            for (int64_t r = 0; r < nd; ++r)
                for (int64_t c = 0; c < ntk; ++c) {
                    float v = iou_xyxy(
                        dets + static_cast<int64_t>(det_ids[static_cast<size_t>(r)]) * 6,
                        &trk_boxes[static_cast<size_t>(trk_ids[static_cast<size_t>(c)]) * 4]);
                    iou[static_cast<size_t>(r * ntk + c)] = v;
                    if (v > 0) cost[static_cast<size_t>(r * ntk + c)] = 1.0 - v;
                }
            std::vector<char> ones_r(static_cast<size_t>(nd), 1), ones_c(static_cast<size_t>(ntk), 1);
            std::vector<int32_t> r2c = full_assignment(cost, nd, ntk, ones_r, ones_c);
            for (int64_t r = 0; r < nd; ++r) {
                int32_t c = r2c[static_cast<size_t>(r)];
                if (c < 0) continue;
                bool ok = low_gate ? iou[static_cast<size_t>(r * ntk + c)] > 0.3f
                                   : cost[static_cast<size_t>(r * ntk + c)] < 1.0;
                if (!ok) continue;
                matches.emplace_back(det_ids[static_cast<size_t>(r)],
                                     trk_ids[static_cast<size_t>(c)]);
                det_taken[static_cast<size_t>(det_ids[static_cast<size_t>(r)])] = 1;
                trk_taken[static_cast<size_t>(trk_ids[static_cast<size_t>(c)])] = 1;
            }
        };

        std::vector<int> all_trks(static_cast<size_t>(nt));
        for (int64_t j = 0; j < nt; ++j) all_trks[static_cast<size_t>(j)] = static_cast<int>(j);
        lsa_pass(high, all_trks, false);
        std::vector<int> left_trks;
        for (int64_t j = 0; j < nt; ++j)
            if (!trk_taken[static_cast<size_t>(j)]) left_trks.push_back(static_cast<int>(j));
        lsa_pass(low, left_trks, true);

        std::vector<int> ud, ut;
        for (int64_t i = 0; i < n; ++i)
            if (!det_taken[static_cast<size_t>(i)]) ud.push_back(static_cast<int>(i));
        for (int64_t j = 0; j < nt; ++j)
            if (!trk_taken[static_cast<size_t>(j)]) ut.push_back(static_cast<int>(j));

        // stage 2: last-matched-bbox recovery
        if (!ud.empty() && !ut.empty()) {
            std::vector<int> valid;
            for (int j : ut)
                if (tracks[static_cast<size_t>(j)]->has_last_matched) valid.push_back(j);
            if (!valid.empty()) {
                const int64_t nd = static_cast<int64_t>(ud.size());
                const int64_t nv = static_cast<int64_t>(valid.size());
                std::vector<double> cost(static_cast<size_t>(nd * nv), 1.0);
                for (int64_t r = 0; r < nd; ++r)
                    for (int64_t c = 0; c < nv; ++c) {
                        float v = iou_xyxy(
                            dets + static_cast<int64_t>(ud[static_cast<size_t>(r)]) * 6,
                            tracks[static_cast<size_t>(valid[static_cast<size_t>(c)])]
                                ->last_matched_bbox);
                        if (v > 0) cost[static_cast<size_t>(r * nv + c)] = 1.0 - v;
                    }
                std::vector<char> ones_r(static_cast<size_t>(nd), 1), ones_c(static_cast<size_t>(nv), 1);
                std::vector<int32_t> r2c = full_assignment(cost, nd, nv, ones_r, ones_c);
                std::vector<int> got_d;
                for (int64_t r = 0; r < nd; ++r) {
                    int32_t c = r2c[static_cast<size_t>(r)];
                    if (c < 0) continue;
                    double cv = cost[static_cast<size_t>(r * nv + c)];
                    if (cv < 1.0 && (1.0 - cv) > cfg_.second_stage_iou_threshold) {
                        matches.emplace_back(ud[static_cast<size_t>(r)],
                                             valid[static_cast<size_t>(c)]);
                        second.emplace_back(ud[static_cast<size_t>(r)],
                                            valid[static_cast<size_t>(c)]);
                        got_d.push_back(ud[static_cast<size_t>(r)]);
                    }
                }
                std::vector<int> rest;
                for (int d : ud)
                    if (std::find(got_d.begin(), got_d.end(), d) == got_d.end())
                        rest.push_back(d);
                ud = rest;
            }
        }
        u_dets = ud;
    }

    Sam2MotConfig cfg_;
    std::vector<Track> tracks_;
    int next_id_ = 1;
    int32_t frame_count_ = 0;
};

}  // namespace boxmot

#endif  // BOXMOT_SAM2MOT_BANK_HPP
