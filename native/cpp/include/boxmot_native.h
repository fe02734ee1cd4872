/* boxmot_native: C ABI for the host-side runtime hot paths.
 *
 * TPU-native counterpart of the reference's native layer
 * (boxmot/native/cpp/trackers/base: io.cpp npy cache IO, live_c_api.hpp
 * det marshalling).  The tracker math itself runs as XLA programs on
 * device; what stays on the (single-core) host is cache IO and the
 * packing of ragged per-frame detections into the padded tensors the
 * device consumes — exactly the pieces implemented here.
 *
 * Error handling contract mirrors reference c_api.hpp: functions return
 * 0 on success / negative on failure and bmt_last_error() returns a
 * thread-local message.
 */

#ifndef BOXMOT_NATIVE_H
#define BOXMOT_NATIVE_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

const char* bmt_version(void);
const char* bmt_last_error(void);

/* Read a little-endian float32 2-D .npy file.
 * On success fills *rows and *cols and returns a malloc'd buffer the caller
 * frees with bmt_free. Returns 0 on success. */
int bmt_read_npy_f32(const char* path, float** data, int64_t* rows, int64_t* cols);

/* Write a float32 2-D .npy file. Returns 0 on success. */
int bmt_write_npy_f32(const char* path, const float* data, int64_t rows, int64_t cols);

/* Append rows to an existing float32 2-D .npy file (or create it),
 * rewriting the header in place — the resumable cache-writer contract
 * (reference AppendableNpyWriter, data/cache.py:140-259). */
int bmt_append_npy_f32(const char* path, const float* data, int64_t rows, int64_t cols);

/* Pack detection cache rows into the padded per-frame tensor fed to the
 * device replay.
 *   rows: (n_rows, 1 + box_cols + 2) [frame, box..., conf, cls], frame 1-based
 *   out:  preallocated (n_frames, max_dets, box_cols + 3) float32 buffer
 *         laid out like engine/replay.pack_frames: padding rows carry
 *         conf = -1 and unit boxes; a det-index column is appended.
 * Returns 0 on success; dets beyond max_dets per frame are dropped. */
int bmt_pack_frames_f32(
    const float* rows, int64_t n_rows, int64_t n_cols,
    int64_t n_frames, int64_t max_dets, int box_cols,
    float* out);

/* Write MOT rows (n, 9) [frame,id,x,y,w,h,conf,cls,ind] as csv text. */
int bmt_write_mot(const char* path, const double* rows, int64_t n);

/* Solve a rectangular assignment with a cost limit (lap.lapjv
 * extend_cost=True, cost_limit=limit semantics; the reference native
 * assignment, trackers/base/src/assignment.cpp).  The problem is
 * augmented to square with limit/2 dummy costs and solved exactly with
 * Jonker-Volgenant shortest augmenting paths.
 *   cost: (n_rows x n_cols) row-major doubles
 *   r2c:  preallocated n_rows int32 output; -1 = unassigned
 * Returns 0 on success. */
int bmt_lapjv(const double* cost, int64_t n_rows, int64_t n_cols,
              double limit, int32_t* r2c);

void bmt_free(void* ptr);

/* Live tracker cores (slot-bank mirrors of the device programs; see
 * src/{bytetrack,ocsort,boosttrack,sfsort}_bank.hpp and the reference
 * per-tracker C APIs, native/cpp/trackers/<t>/src/c_api.cpp).
 *   name:   "bytetrack" | "ocsort" | "boosttrack" | "sfsort"
 *   config: "key=value;key=value" tracker parameters
 * Update consumes (n x 6) [x1,y1,x2,y2,conf,cls] float32 rows and fills
 * out (capacity x 8) [x1,y1,x2,y2,id,conf,cls,det_ind]; returns rows
 * written or -1 (see bmt_tracker_last_error). */
void* bmt_tracker_create(const char* name, const char* config);
void bmt_tracker_destroy(void* handle);
int bmt_tracker_reset(void* handle);
int bmt_tracker_capacity(void* handle);
int bmt_tracker_out_cols(void* handle); /* 8 (AABB) or 9 (OBB xywha) */
int64_t bmt_tracker_update(void* handle, const float* dets, int64_t n, float* out);
/* As bmt_tracker_update plus the (H x W x 3) BGR uint8 frame; CMC-capable
 * cores estimate camera motion from it, others ignore it. */
int64_t bmt_tracker_update_img(void* handle, const float* dets, int64_t n,
                               const uint8_t* img, int64_t H, int64_t W, float* out);
const char* bmt_tracker_last_error(void);

/* Standalone ECC camera-motion estimation (src/ecc_cmc.hpp).  warp6 is a
 * row-major 2x3 affine mapping prev -> curr coordinates. */
void* bmt_cmc_create(int euclidean, int max_iter, double scale);
void bmt_cmc_destroy(void* handle);
int bmt_cmc_apply(void* handle, const uint8_t* img, int64_t H, int64_t W, float* warp6);

/* ReID inference over exported OSNet weights (src/reid_net.hpp;
 * manifest from boxmot_tpu.native.reid.export_native_reid). */
void* bmt_reid_create(const char* manifest_path);
void bmt_reid_destroy(void* handle);
int bmt_reid_feature_dim(void* handle);
int bmt_reid_compute(void* handle, const uint8_t* img_bgr, int64_t H, int64_t W,
                     const float* boxes_xyxy, int64_t n, float* out);
const char* bmt_reid_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* BOXMOT_NATIVE_H */
