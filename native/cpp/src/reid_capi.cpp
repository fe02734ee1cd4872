// Flat C ABI over the native ReID runtime (reid_net.hpp).
//
// Mirrors the reference's ReID C ABI surface
// (boxmot/native/cpp/trackers/base/reid_capi.h:37-90:
// boxmot_reid_capi_{create,destroy,feature_dim,compute_features,
// last_error}), backed by the hand-coded OSNet instead of ONNXRuntime.

#include <cstdint>
#include <exception>
#include <string>

#include "reid_net.hpp"

namespace {

thread_local std::string g_reid_error;

}  // namespace

extern "C" {

const char* bmt_reid_last_error(void) { return g_reid_error.c_str(); }

void* bmt_reid_create(const char* manifest_path) {
    g_reid_error.clear();
    try {
        return new boxmot::ReidNet(manifest_path ? manifest_path : "");
    } catch (const std::exception& e) {
        g_reid_error = e.what();
        return nullptr;
    }
}

void bmt_reid_destroy(void* h) { delete static_cast<boxmot::ReidNet*>(h); }

int bmt_reid_feature_dim(void* h) {
    return h ? static_cast<boxmot::ReidNet*>(h)->feature_dim() : -1;
}

// img: (H, W, 3) BGR uint8 row-major; boxes: (n, 4) xyxy float32.
// out: (n, feature_dim) float32.  Returns 0 on success.
int bmt_reid_compute(void* h, const uint8_t* img, int64_t H, int64_t W,
                     const float* boxes, int64_t n, float* out) {
    if (!h || (n > 0 && (!img || !boxes || !out)) || H <= 0 || W <= 0) {
        g_reid_error = "bad args to bmt_reid_compute";
        return -1;
    }
    auto* net = static_cast<boxmot::ReidNet*>(h);
    try {
        boxmot::FMap crop;
        for (int64_t i = 0; i < n; ++i) {
            net->make_crop(img, H, W, boxes + i * 4, crop);
            net->forward(crop, out + i * net->feature_dim());
        }
    } catch (const std::exception& e) {
        g_reid_error = e.what();
        return -1;
    }
    return 0;
}

}  // extern "C"
