// boxmot_replay — standalone native replay executable.
//
// Mirror of the reference's per-tracker replay executables
// (boxmot/native/cpp/trackers/*/src/main.cpp and the stdout protocol in
// boxmot/native/_common.py:28): read a detection cache, run a slot-bank
// tracker core over it, write MOT rows, and report progress as
// "BOXMOT_PROGRESS\t<frame>\t<total>" lines plus a final JSON summary.
//
// usage: boxmot_replay <tracker> <dets.npy> <out.txt> [config] [seq_len] [min_conf]
//   dets.npy: (N, 7) float32 rows [frame(1-based), x1, y1, x2, y2, conf, cls]
//             or (N, 8) OBB rows [frame, cx, cy, w, h, angle, conf, cls]
//             (pair the 8-col layout with an OBB tracker, e.g. bytetrack_obb)
//   config:   "key=value;key=value" tracker parameters
//   seq_len:  total frames (default: max frame in the cache)
//   min_conf: drop detections below this confidence before tracking
//
// AABB output: the 9-col MOT csv (engine/mot_io.py convention).  OBB
// output: corner-format rows [frame, id, x1..y4, conf, cls, 1] matching
// engine/eval_obb.py's track_sequence_obb.

#include <cinttypes>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "boxmot_native.h"
#include "obb_common.hpp"

namespace {

// banker's rounding, matching numpy's .round() in
// boxmot_tpu/engine/mot_io.py convert_to_mot_format
double round_even(double v) { return std::nearbyint(v); }

}  // namespace

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr,
                     "usage: %s <tracker> <dets.npy> <out.txt> [config] "
                     "[seq_len] [min_conf]\n",
                     argv[0]);
        return 2;
    }
    const char* tracker = argv[1];
    const char* dets_path = argv[2];
    const char* out_path = argv[3];
    const char* config = argc > 4 ? argv[4] : "";
    int64_t seq_len = argc > 5 ? std::atoll(argv[5]) : 0;
    double min_conf = argc > 6 ? std::atof(argv[6]) : -1.0;

    float* data = nullptr;
    int64_t rows = 0, cols = 0;
    if (bmt_read_npy_f32(dets_path, &data, &rows, &cols) != 0) {
        std::fprintf(stderr, "error: %s\n", bmt_last_error());
        return 1;
    }
    if (cols != 7 && cols != 8) {
        std::fprintf(stderr,
                     "error: dets cache must be (N, 7) AABB or (N, 8) OBB, got "
                     "%" PRId64 " cols\n",
                     cols);
        bmt_free(data);
        return 1;
    }
    const int DC = static_cast<int>(cols) - 1;  // per-frame det columns
    const int conf_idx = DC - 2;

    int64_t n_frames = seq_len;
    for (int64_t i = 0; i < rows; ++i)
        n_frames = std::max(n_frames, static_cast<int64_t>(data[i * cols]));

    void* h = bmt_tracker_create(tracker, config);
    if (!h) {
        std::fprintf(stderr, "error: %s\n", bmt_tracker_last_error());
        bmt_free(data);
        return 1;
    }
    const int K = bmt_tracker_capacity(h);
    const int OC = bmt_tracker_out_cols(h);
    if ((OC == 9) != (DC == 7)) {
        std::fprintf(stderr,
                     "error: cache layout (%d det cols) does not match tracker "
                     "output (%d cols)\n",
                     DC, OC);
        bmt_tracker_destroy(h);
        bmt_free(data);
        return 1;
    }
    std::vector<float> frame_dets;
    std::vector<float> out_buf(static_cast<size_t>(K) * OC);
    std::vector<double> mot_rows;  // 9-col AABB or 13-col OBB corner rows

    int64_t cursor = 0;  // cache rows are frame-ordered by construction
    for (int64_t f = 1; f <= n_frames; ++f) {
        frame_dets.clear();
        while (cursor < rows && static_cast<int64_t>(data[cursor * cols]) == f) {
            const float* r = data + cursor * cols;
            if (r[1 + conf_idx] >= min_conf)
                frame_dets.insert(frame_dets.end(), r + 1, r + 1 + DC);
            ++cursor;
        }
        int64_t m = bmt_tracker_update(
            h, frame_dets.data(), static_cast<int64_t>(frame_dets.size() / DC),
            out_buf.data());
        if (m < 0) {
            std::fprintf(stderr, "error: %s\n", bmt_tracker_last_error());
            bmt_tracker_destroy(h);
            bmt_free(data);
            return 1;
        }
        for (int64_t i = 0; i < m; ++i) {
            const float* r = &out_buf[static_cast<size_t>(i) * OC];
            if (OC == 8) {
                double x = r[0], y = r[1], w = r[2] - r[0], hh = r[3] - r[1];
                mot_rows.insert(mot_rows.end(),
                                {static_cast<double>(f), static_cast<double>(r[4]),
                                 round_even(x), round_even(y), round_even(w),
                                 round_even(hh), static_cast<double>(r[5]),
                                 static_cast<double>(r[6]) + 1.0,
                                 static_cast<double>(r[7])});
            } else {
                float corners[4][2];
                boxmot::obb_corners(r, corners);
                mot_rows.insert(mot_rows.end(),
                                {static_cast<double>(f), static_cast<double>(r[5])});
                for (int k = 0; k < 4; ++k)
                    mot_rows.insert(mot_rows.end(),
                                    {static_cast<double>(corners[k][0]),
                                     static_cast<double>(corners[k][1])});
                mot_rows.insert(mot_rows.end(),
                                {static_cast<double>(r[6]),
                                 static_cast<double>(r[7]), 1.0});
            }
        }
        if (f % 50 == 0 || f == n_frames)
            std::printf("BOXMOT_PROGRESS\t%" PRId64 "\t%" PRId64 "\n", f, n_frames);
    }
    bmt_tracker_destroy(h);
    bmt_free(data);

    const int row_w = OC == 8 ? 9 : 13;
    if (OC == 8) {
        if (bmt_write_mot(out_path, mot_rows.data(),
                          static_cast<int64_t>(mot_rows.size() / 9)) != 0) {
            std::fprintf(stderr, "error: %s\n", bmt_last_error());
            return 1;
        }
    } else {
        FILE* fp = std::fopen(out_path, "w");
        if (!fp) {
            std::fprintf(stderr, "error: cannot open %s\n", out_path);
            return 1;
        }
        const int64_t n = static_cast<int64_t>(mot_rows.size()) / row_w;
        for (int64_t i = 0; i < n; ++i) {
            const double* r = mot_rows.data() + i * row_w;
            for (int c = 0; c < row_w; ++c)
                std::fprintf(fp, c + 1 == row_w ? "%.10g\n" : "%.10g,", r[c]);
        }
        std::fclose(fp);
    }
    std::printf("{\"frames\": %" PRId64 ", \"rows\": %" PRId64 "}\n", n_frames,
                static_cast<int64_t>(mot_rows.size()) / row_w);
    return 0;
}
