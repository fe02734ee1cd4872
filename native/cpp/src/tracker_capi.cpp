// Flat C ABI over the native slot-bank tracker cores.
//
// Mirrors the role of the reference's per-tracker live C APIs
// (boxmot/native/cpp/trackers/*/src/c_api.cpp; contract described in
// live_c_api.hpp): create from a config string, feed (N, 6) detections
// per frame — optionally with the BGR frame for camera-motion
// compensation, or with per-detection appearance embeddings
// (bmt_tracker_update_embs; the role the reference's cpp replay fills
// by reading dets+embs caches, native/cpp/trackers/base/src/io.cpp) —
// receive (M, 8) [x1,y1,x2,y2,id,conf,cls,det_ind] rows.

#include <cstdint>
#include <cstring>
#include <memory>
#include <string>
#include <type_traits>

#include "boosttrack_bank.hpp"
#include "botsort_bank.hpp"
#include "bytetrack_bank.hpp"
#include "deepocsort_bank.hpp"
#include "ecc_cmc.hpp"
#include "hybridsort_bank.hpp"
#include "occluboost_bank.hpp"
#include "ocsort_bank.hpp"
#include "sam2mot_bank.hpp"
#include "sfsort_bank.hpp"
#include "strongsort_bank.hpp"

namespace {

thread_local std::string g_tracker_error;

template <class T, class = void>
struct has_out_cols : std::false_type {};
template <class T>
struct has_out_cols<T, std::void_t<decltype(std::declval<const T&>().out_cols())>>
    : std::true_type {};

template <class T, class = void>
struct has_step_masks : std::false_type {};
template <class T>
struct has_step_masks<T, std::void_t<decltype(std::declval<T&>().step_masks(
                             static_cast<const float*>(nullptr), int64_t{0},
                             static_cast<const uint8_t*>(nullptr), int64_t{0},
                             int64_t{0}, int64_t{0}, int64_t{0},
                             static_cast<float*>(nullptr),
                             static_cast<uint8_t*>(nullptr)))>> : std::true_type {};

template <class T, class = void>
struct has_step_img : std::false_type {};
template <class T>
struct has_step_img<T, std::void_t<decltype(std::declval<T&>().step_img(
                           static_cast<const float*>(nullptr), int64_t{0},
                           static_cast<const uint8_t*>(nullptr), int64_t{0},
                           int64_t{0}, static_cast<float*>(nullptr)))>>
    : std::true_type {};

template <class T, class = void>
struct has_step_embs : std::false_type {};
template <class T>
struct has_step_embs<T, std::void_t<decltype(std::declval<T&>().step_embs(
                            static_cast<const float*>(nullptr), int64_t{0},
                            static_cast<const float*>(nullptr), int64_t{0},
                            static_cast<float*>(nullptr)))>> : std::true_type {};

template <class T, class = void>
struct has_flush_rows : std::false_type {};
template <class T>
struct has_flush_rows<T, std::void_t<decltype(std::declval<T&>().flush_rows(
                             static_cast<float*>(nullptr), int64_t{0}))>>
    : std::true_type {};

template <class T, class = void>
struct has_step_img_embs : std::false_type {};
template <class T>
struct has_step_img_embs<T,
                         std::void_t<decltype(std::declval<T&>().step_img_embs(
                             static_cast<const float*>(nullptr), int64_t{0},
                             static_cast<const uint8_t*>(nullptr), int64_t{0},
                             int64_t{0}, static_cast<const float*>(nullptr),
                             int64_t{0}, static_cast<float*>(nullptr)))>>
    : std::true_type {};

struct TrackerHandle {
    virtual ~TrackerHandle() = default;
    virtual void reset() = 0;
    virtual int64_t step(const float* dets, int64_t n, float* out) = 0;
    virtual int64_t step_img(const float* dets, int64_t n, const uint8_t* img,
                             int64_t H, int64_t W, float* out) = 0;
    virtual int64_t step_masks(const float* dets, int64_t n, const uint8_t* masks,
                               int64_t mH, int64_t mW, int64_t fH, int64_t fW,
                               float* out, uint8_t* out_masks) = 0;
    virtual int64_t step_embs(const float* dets, int64_t n, const float* embs,
                              int64_t feat_dim, float* out) = 0;
    virtual int64_t step_img_embs(const float* dets, int64_t n,
                                  const uint8_t* img, int64_t H, int64_t W,
                                  const float* embs, int64_t feat_dim,
                                  float* out) = 0;
    virtual bool supports_embs() const = 0;
    virtual int64_t pending_rows() const = 0;
    virtual int64_t flush_rows(float* out, int64_t max_rows) = 0;
    virtual int capacity() const = 0;
    virtual int out_cols() const = 0;
    virtual int64_t next_track_id() const = 0;
};

template <class Core>
struct HandleImpl final : TrackerHandle {
    Core core;
    explicit HandleImpl(const Core& c) : core(c) {}
    void reset() override { core.reset(); }
    int64_t step(const float* dets, int64_t n, float* out) override {
        return core.step(dets, n, out);
    }
    int64_t step_img(const float* dets, int64_t n, const uint8_t* img, int64_t H,
                     int64_t W, float* out) override {
        if constexpr (has_step_img<Core>::value) {
            return core.step_img(dets, n, img, H, W, out);
        } else {
            (void)img; (void)H; (void)W;
            return core.step(dets, n, out);  // motion-only core: frame unused
        }
    }
    int64_t step_masks(const float* dets, int64_t n, const uint8_t* masks,
                       int64_t mH, int64_t mW, int64_t fH, int64_t fW,
                       float* out, uint8_t* out_masks) override {
        if constexpr (has_step_masks<Core>::value) {
            return core.step_masks(dets, n, masks, mH, mW, fH, fW, out, out_masks);
        } else {
            (void)masks; (void)mH; (void)mW; (void)fH; (void)fW; (void)out_masks;
            return core.step(dets, n, out);  // box-only core: masks unused
        }
    }
    int64_t step_embs(const float* dets, int64_t n, const float* embs,
                      int64_t feat_dim, float* out) override {
        if constexpr (has_step_embs<Core>::value) {
            return core.step_embs(dets, n, embs, feat_dim, out);
        } else {
            (void)embs; (void)feat_dim;
            return core.step(dets, n, out);  // motion-only core: embs unused
        }
    }
    int64_t step_img_embs(const float* dets, int64_t n, const uint8_t* img,
                          int64_t H, int64_t W, const float* embs,
                          int64_t feat_dim, float* out) override {
        if constexpr (has_step_img_embs<Core>::value) {
            return core.step_img_embs(dets, n, img, H, W, embs, feat_dim, out);
        } else if constexpr (has_step_embs<Core>::value) {
            (void)img; (void)H; (void)W;
            return core.step_embs(dets, n, embs, feat_dim, out);
        } else {
            return step_img(dets, n, img, H, W, out);
        }
    }
    bool supports_embs() const override { return has_step_embs<Core>::value; }
    int64_t pending_rows() const override {
        if constexpr (has_flush_rows<Core>::value) {
            return core.pending_rows();
        } else {
            return 0;
        }
    }
    int64_t flush_rows(float* out, int64_t max_rows) override {
        if constexpr (has_flush_rows<Core>::value) {
            return core.flush_rows(out, max_rows);
        } else {
            (void)out; (void)max_rows;
            return 0;
        }
    }
    int capacity() const override { return core.capacity(); }
    int64_t next_track_id() const override { return core.next_track_id(); }
    int out_cols() const override {
        if constexpr (has_out_cols<Core>::value) {
            return core.out_cols();
        } else {
            return 8;
        }
    }
};

}  // namespace

extern "C" {

const char* bmt_tracker_last_error(void) { return g_tracker_error.c_str(); }

// name: tracker type ("bytetrack"); config: "key=value;key=value".
void* bmt_tracker_create(const char* name, const char* config) {
    g_tracker_error.clear();
    std::string n = name ? name : "";
    if (n == "bytetrack") {
        auto cfg = boxmot::ByteTrackConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::ByteTrackCore>(boxmot::ByteTrackCore(cfg));
    }
    if (n == "bytetrack_obb") {
        auto cfg = boxmot::ByteTrackConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::ByteTrackObbCore>(boxmot::ByteTrackObbCore(cfg));
    }
    if (n == "ocsort") {
        auto cfg = boxmot::OcSortConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16) || cfg.delta_t <= 0) {
            g_tracker_error = "bad capacity/delta_t";
            return nullptr;
        }
        return new HandleImpl<boxmot::OcSortCore>(boxmot::OcSortCore(cfg));
    }
    if (n == "ocsort_obb") {
        auto cfg = boxmot::OcSortConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16) || cfg.delta_t <= 0) {
            g_tracker_error = "bad capacity/delta_t";
            return nullptr;
        }
        return new HandleImpl<boxmot::OcSortObbCore>(boxmot::OcSortObbCore(cfg));
    }
    if (n == "boosttrack") {
        auto cfg = boxmot::BoostTrackConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::BoostTrackCore>(boxmot::BoostTrackCore(cfg));
    }
    if (n == "sfsort") {
        auto cfg = boxmot::SFSortConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::SFSortCore>(boxmot::SFSortCore(cfg));
    }
    if (n == "sfsort_obb") {
        auto cfg = boxmot::SFSortConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::SFSortObbCore>(boxmot::SFSortObbCore(cfg));
    }
    if (n == "occluboost") {
        auto cfg = boxmot::OccluBoostConfig::from_string(config);
        if (cfg.boost.capacity <= 0 || cfg.boost.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::OccluBoostCore>(boxmot::OccluBoostCore(cfg));
    }
    if (n == "botsort") {
        auto cfg = boxmot::BotSortConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::BotSortCore>(boxmot::BotSortCore(cfg));
    }
    if (n == "strongsort") {
        auto cfg = boxmot::StrongSortConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::StrongSortCore>(boxmot::StrongSortCore(cfg));
    }
    if (n == "deepocsort") {
        auto cfg = boxmot::DeepOcSortConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16) || cfg.delta_t <= 0) {
            g_tracker_error = "bad capacity/delta_t";
            return nullptr;
        }
        return new HandleImpl<boxmot::DeepOcSortCore>(boxmot::DeepOcSortCore(cfg));
    }
    if (n == "hybridsort") {
        auto cfg = boxmot::HybridSortConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16) || cfg.delta_t <= 0) {
            g_tracker_error = "bad capacity/delta_t";
            return nullptr;
        }
        return new HandleImpl<boxmot::HybridSortCore>(boxmot::HybridSortCore(cfg));
    }
    if (n == "sam2mot") {
        auto cfg = boxmot::Sam2MotConfig::from_string(config);
        if (cfg.capacity <= 0 || cfg.capacity > (1 << 16)) {
            g_tracker_error = "bad capacity";
            return nullptr;
        }
        return new HandleImpl<boxmot::Sam2MotCore>(boxmot::Sam2MotCore(cfg));
    }
    g_tracker_error = "unknown native tracker: " + n;
    return nullptr;
}

void bmt_tracker_destroy(void* h) { delete static_cast<TrackerHandle*>(h); }

int bmt_tracker_reset(void* h) {
    if (!h) {
        g_tracker_error = "null handle";
        return -1;
    }
    static_cast<TrackerHandle*>(h)->reset();
    return 0;
}

int bmt_tracker_capacity(void* h) {
    return h ? static_cast<TrackerHandle*>(h)->capacity() : -1;
}

// id the next created track will carry in the output rows; the host's
// per-class GlobalIdAllocator reads deltas of this across a step to
// renumber class-bank ids into the reference's shared-counter sequence
int64_t bmt_tracker_next_track_id(void* h) {
    return h ? static_cast<TrackerHandle*>(h)->next_track_id() : -1;
}

// output row width: 8 (AABB) or 9 (OBB: xywha + id/conf/cls/det_ind)
int bmt_tracker_out_cols(void* h) {
    return h ? static_cast<TrackerHandle*>(h)->out_cols() : -1;
}

// dets: (n, 6) [x1,y1,x2,y2,conf,cls] float32 row-major.  out must hold
// capacity() * 8 floats.  Returns rows written, or -1 on error.
int64_t bmt_tracker_update(void* h, const float* dets, int64_t n, float* out) {
    if (!h || (n > 0 && !dets) || !out) {
        g_tracker_error = "bad args to bmt_tracker_update";
        return -1;
    }
    return static_cast<TrackerHandle*>(h)->step(dets, n, out);
}

// As bmt_tracker_update plus per-detection segmentation masks
// (n x mH x mW uint8) and the frame size; mask-capable cores (sam2mot)
// associate on them and fill out_masks (capacity x mH x mW, nullable).
int64_t bmt_tracker_update_masks(void* h, const float* dets, int64_t n,
                                 const uint8_t* masks, int64_t mH, int64_t mW,
                                 int64_t fH, int64_t fW, float* out,
                                 uint8_t* out_masks) {
    if (!h || (n > 0 && !dets) || !out) {
        g_tracker_error = "bad args to bmt_tracker_update_masks";
        return -1;
    }
    return static_cast<TrackerHandle*>(h)->step_masks(dets, n, masks, mH, mW, fH,
                                                      fW, out, out_masks);
}

// As bmt_tracker_update plus per-detection appearance embeddings
// (n x feat_dim float32, aligned row-for-row with dets); appearance-
// capable cores fuse them into association and maintain their feature
// banks, others ignore them — matching the device-tracker semantics
// where motion-only trackers accept and ignore an embs input.
int64_t bmt_tracker_update_embs(void* h, const float* dets, int64_t n,
                                const float* embs, int64_t feat_dim,
                                float* out) {
    if (!h || (n > 0 && !dets) || !out || (n > 0 && feat_dim > 0 && !embs)) {
        g_tracker_error = "bad args to bmt_tracker_update_embs";
        return -1;
    }
    return static_cast<TrackerHandle*>(h)->step_embs(dets, n, embs, feat_dim, out);
}

// 1 if the core consumes embeddings in bmt_tracker_update_embs (has an
// appearance path), 0 if it would ignore them, -1 on null handle.
int bmt_tracker_supports_embs(void* h) {
    return h ? (static_cast<TrackerHandle*>(h)->supports_embs() ? 1 : 0) : -1;
}

// Live path with both the BGR frame (camera-motion estimation) and
// per-detection embeddings (appearance fusion).
int64_t bmt_tracker_update_img_embs(void* h, const float* dets, int64_t n,
                                    const uint8_t* img, int64_t H, int64_t W,
                                    const float* embs, int64_t feat_dim,
                                    float* out) {
    if (!h || (n > 0 && !dets) || !out) {
        g_tracker_error = "bad args to bmt_tracker_update_img_embs";
        return -1;
    }
    return static_cast<TrackerHandle*>(h)->step_img_embs(dets, n, img, H, W,
                                                         embs, feat_dim, out);
}

// As bmt_tracker_update plus the (H, W, 3) BGR uint8 frame; CMC-capable
// cores estimate camera motion from it, others ignore it.
int64_t bmt_tracker_update_img(void* h, const float* dets, int64_t n,
                               const uint8_t* img, int64_t H, int64_t W,
                               float* out) {
    if (!h || (n > 0 && !dets) || !out) {
        g_tracker_error = "bad args to bmt_tracker_update_img";
        return -1;
    }
    return static_cast<TrackerHandle*>(h)->step_img(dets, n, img, H, W, out);
}

// Deferred side-channel rows a core accumulated during tracking (the
// flagship's GTA gap-interpolation rows, 9 floats each: [frame, id,
// x1, y1, x2, y2, conf, cls, -1]).  pending reports how many are
// buffered; flush copies up to max_rows into out and clears the buffer.
// Cores without the capability report 0.  GP smoothing stays host-side
// (device occluboost.flush_gta_rows split).
int64_t bmt_tracker_pending_rows(void* h) {
    return h ? static_cast<TrackerHandle*>(h)->pending_rows() : -1;
}

int64_t bmt_tracker_flush_rows(void* h, float* out, int64_t max_rows) {
    if (!h || (max_rows > 0 && !out)) {
        g_tracker_error = "bad args to bmt_tracker_flush_rows";
        return -1;
    }
    return static_cast<TrackerHandle*>(h)->flush_rows(out, max_rows);
}

// Standalone ECC camera-motion estimator (ecc_cmc.hpp; mirrors
// boxmot_tpu/motion/cmc.py ECC).  warp6: row-major 2x3 out.
void* bmt_cmc_create(int euclidean, int max_iter, double scale) {
    return new boxmot::EccCmc(euclidean ? 1 : 0, max_iter,
                              static_cast<float>(scale));
}

void bmt_cmc_destroy(void* h) { delete static_cast<boxmot::EccCmc*>(h); }

int bmt_cmc_apply(void* h, const uint8_t* img, int64_t H, int64_t W, float* warp6) {
    if (!h || !img || !warp6) {
        g_tracker_error = "bad args to bmt_cmc_apply";
        return -1;
    }
    boxmot::Warp2x3 w = static_cast<boxmot::EccCmc*>(h)->apply(img, H, W);
    std::memcpy(warp6, w.m, sizeof(w.m));
    return 0;
}

}  // extern "C"
