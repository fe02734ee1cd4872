// Hand-coded OSNet inference for the native ReID backend.
//
// Runs the exact architecture of boxmot_tpu/models/osnet.py (NHWC,
// BatchNorm folded to affine at export, instance norms computed at
// runtime) over weights exported by boxmot_tpu/native/reid.py.  Fills
// the role of the reference's OnnxReIdModel
// (boxmot/native/cpp/trackers/base/src/reid_onnx.cpp) without an
// ONNXRuntime dependency: crop grid, ImageNet standardization, and
// L2-normalized embeddings all mirror the device pipeline
// (boxmot_tpu/ops/crops.py, reid/core.py).

#ifndef BOXMOT_REID_NET_HPP
#define BOXMOT_REID_NET_HPP

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <fstream>
#include <limits>
#include <sstream>
#include <stdexcept>
#include <string>
#include <unordered_map>
#include <vector>

namespace boxmot {

struct NamedTensor {
    std::vector<int> shape;
    const float* data = nullptr;
    int64_t numel() const {
        int64_t n = 1;
        for (int d : shape) n *= d;
        return n;
    }
};

// (H, W, C) feature map in NHWC
struct FMap {
    int h = 0, w = 0, c = 0;
    std::vector<float> data;
    void init(int hh, int ww, int cc) {
        h = hh; w = ww; c = cc;
        data.assign(static_cast<size_t>(hh) * ww * cc, 0.0f);
    }
    float* at(int y, int x) { return data.data() + (static_cast<size_t>(y) * w + x) * c; }
    const float* at(int y, int x) const {
        return data.data() + (static_cast<size_t>(y) * w + x) * c;
    }
};

class ReidNet {
  public:
    // Parses manifest.txt + weights.bin.  Throws std::runtime_error on
    // malformed files or missing tensors.
    explicit ReidNet(const std::string& manifest_path) {
        std::ifstream mf(manifest_path);
        if (!mf) throw std::runtime_error("cannot open " + manifest_path);
        std::string dir = manifest_path;
        size_t slash = dir.find_last_of('/');
        dir = slash == std::string::npos ? "." : dir.substr(0, slash);

        std::string line;
        struct Pending { std::string name; std::vector<int> shape; int64_t offset; };
        std::vector<Pending> pend;
        while (std::getline(mf, line)) {
            std::istringstream ss(line);
            std::string key;
            ss >> key;
            if (key == "channels") {
                std::string v; ss >> v;
                channels_ = parse_ints(v);
            } else if (key == "blocks") {
                std::string v; ss >> v;
                blocks_ = parse_ints(v);
            } else if (key == "feature_dim") {
                ss >> feature_dim_;
            } else if (key == "block_types") {
                std::string v; ss >> v;
                block_types_.clear();
                std::istringstream st(v);
                std::string stage;
                while (std::getline(st, stage, ';')) {
                    std::vector<std::string> types;
                    std::istringstream sb(stage);
                    std::string t;
                    while (std::getline(sb, t, ',')) types.push_back(t);
                    block_types_.push_back(types);
                }
            } else if (key == "arch") {
                ss >> arch_;
            } else if (key == "ain") {
                ss >> ain_;
            } else if (key == "conv1_in") {
                ss >> conv1_in_;
            } else if (key == "ibn") {
                ss >> ibn_;
            } else if (key == "crop") {
                ss >> crop_h_ >> crop_w_;
            } else if (key == "tensor") {
                Pending p;
                std::string shape;
                ss >> p.name >> shape >> p.offset;
                p.shape = parse_ints(shape);
                pend.push_back(p);
            }
        }
        std::ifstream wf(dir + "/weights.bin", std::ios::binary | std::ios::ate);
        if (!wf) throw std::runtime_error("cannot open weights.bin next to manifest");
        const int64_t bytes = wf.tellg();
        wf.seekg(0);
        blob_.resize(static_cast<size_t>(bytes / 4));
        wf.read(reinterpret_cast<char*>(blob_.data()), bytes);
        for (const auto& p : pend) {
            NamedTensor t;
            t.shape = p.shape;
            if (p.offset < 0 || p.offset + t.numel() > static_cast<int64_t>(blob_.size()))
                throw std::runtime_error("tensor out of bounds: " + p.name);
            t.data = blob_.data() + p.offset;
            tensors_[p.name] = t;
        }
        if (channels_.size() != 4 || blocks_.size() != 3 || feature_dim_ <= 0)
            throw std::runtime_error("malformed manifest: " + manifest_path);
    }

    int feature_dim() const { return feature_dim_; }
    int crop_h() const { return crop_h_; }
    int crop_w() const { return crop_w_; }

    // img: (H, W, 3) BGR uint8; box: xyxy.  Writes a standardized RGB
    // crop into `crop` (crop_h, crop_w, 3) mirroring
    // crops.extract_crops (cv2-style grid, border-clamped bilinear).
    void make_crop(const uint8_t* img, int64_t H, int64_t W, const float* box,
                   FMap& crop) const {
        static const float kMean[3] = {0.485f, 0.456f, 0.406f};
        static const float kStd[3] = {0.229f, 0.224f, 0.225f};
        crop.init(crop_h_, crop_w_, 3);
        float x1 = box[0], y1 = box[1], x2 = box[2], y2 = box[3];
        float sy = (y2 - y1) / crop_h_;
        float sx = (x2 - x1) / crop_w_;
        for (int i = 0; i < crop_h_; ++i) {
            float ys = std::min(std::max((i + 0.5f) * sy + y1 - 0.5f, 0.0f),
                                static_cast<float>(H - 1));
            int y0 = static_cast<int>(std::floor(ys));
            int y1i = std::min(y0 + 1, static_cast<int>(H - 1));
            float wy = ys - static_cast<float>(y0);
            for (int j = 0; j < crop_w_; ++j) {
                float xs = std::min(std::max((j + 0.5f) * sx + x1 - 0.5f, 0.0f),
                                    static_cast<float>(W - 1));
                int x0 = static_cast<int>(std::floor(xs));
                int x1i = std::min(x0 + 1, static_cast<int>(W - 1));
                float wx = xs - static_cast<float>(x0);
                float* dst = crop.at(i, j);
                for (int ch = 0; ch < 3; ++ch) {
                    int sc = 2 - ch;  // BGR -> RGB
                    float v00 = img[(y0 * W + x0) * 3 + sc];
                    float v01 = img[(y0 * W + x1i) * 3 + sc];
                    float v10 = img[(y1i * W + x0) * 3 + sc];
                    float v11 = img[(y1i * W + x1i) * 3 + sc];
                    float top = v00 * (1 - wx) + v01 * wx;
                    float bot = v10 * (1 - wx) + v11 * wx;
                    float v = (top * (1 - wy) + bot * wy) / 255.0f;
                    dst[ch] = (v - kMean[ch]) / kStd[ch];
                }
            }
        }
    }

    // standardized crop -> L2-normalized embedding (feature_dim,)
    void forward(const FMap& crop, float* out_feat) const {
        if (arch_ == "lmbn") {
            forward_lmbn(crop, out_feat);
            return;
        }
        FMap x = crop, tmp;
        // stem: conv1 (7x7/2) + norm + relu, then 3x3/2 maxpool
        conv(x, tmp, "conv1/conv/kernel", 2, 3, 1, nullptr);
        if (conv1_in_ || ibn_) inorm(tmp, "conv1/in");
        else affine(tmp, "conv1/bn");
        relu(tmp);
        maxpool3x3s2p1(tmp, x);
        // stages
        for (int stage = 0; stage < 3; ++stage) {
            for (int b = 0; b < blocks_[static_cast<size_t>(stage)]; ++b) {
                std::string name =
                    "conv" + std::to_string(stage + 2) + "_" + std::to_string(b);
                os_block(x, name, channels_[static_cast<size_t>(stage + 1)],
                         block_types_[static_cast<size_t>(stage)][static_cast<size_t>(b)] == "in",
                         ibn_ && stage == 0);
            }
            if (stage < 2) {
                std::string tn = "transition" + std::to_string(stage + 2);
                conv(x, tmp, tn + "/conv/kernel", 1, 0, 1, nullptr);
                affine(tmp, tn + "/bn");
                relu(tmp);
                avgpool2x2s2(tmp, x);
            }
        }
        // conv5 + global average pool + fc head
        conv(x, tmp, "conv5/conv/kernel", 1, 0, 1, nullptr);
        affine(tmp, "conv5/bn");
        relu(tmp);
        std::vector<float> pooled(static_cast<size_t>(tmp.c), 0.0f);
        for (int y = 0; y < tmp.h; ++y)
            for (int xx = 0; xx < tmp.w; ++xx) {
                const float* p = tmp.at(y, xx);
                for (int ch = 0; ch < tmp.c; ++ch) pooled[static_cast<size_t>(ch)] += p[ch];
            }
        float inv = 1.0f / static_cast<float>(tmp.h * tmp.w);
        for (float& v : pooled) v *= inv;
        const NamedTensor& fk = get("fc/kernel");
        const NamedTensor& fb = get("fc/bias");
        const NamedTensor& fa = get("fc_bn/a");
        const NamedTensor& fbn_b = get("fc_bn/b");
        const int F = feature_dim_;
        std::vector<float> feat(static_cast<size_t>(F));
        for (int o = 0; o < F; ++o) feat[static_cast<size_t>(o)] = fb.data[o];
        for (int ci = 0; ci < tmp.c; ++ci) {
            float v = pooled[static_cast<size_t>(ci)];
            const float* kp = fk.data + static_cast<int64_t>(ci) * F;
            for (int o = 0; o < F; ++o) feat[static_cast<size_t>(o)] += v * kp[o];
        }
        double norm = 0.0;
        for (int o = 0; o < F; ++o) {
            float v = feat[static_cast<size_t>(o)] * fa.data[o] + fbn_b.data[o];
            v = std::max(v, 0.0f);  // relu
            feat[static_cast<size_t>(o)] = v;
            norm += static_cast<double>(v) * v;
        }
        float inv_n = static_cast<float>(1.0 / std::max(std::sqrt(norm), 1e-12));
        for (int o = 0; o < F; ++o) out_feat[o] = feat[static_cast<size_t>(o)] * inv_n;
    }

  private:
    // LMBN_n / LMBN_ain_n forward (boxmot_tpu/models/lmbn.py LMBN;
    // reference boxmot/reid/backbones/lmbn/lmbn_n.py:14-145): OSNet
    // x1.0 trunk shared through conv3_0, three branch copies of the
    // remaining stages, 7 BNNeck'd heads stacked channel-major into a
    // (512*7,) embedding.
    void forward_lmbn(const FMap& crop, float* out_feat) const {
        const bool ain = ain_ != 0;
        FMap x = crop, tmp;
        // shared trunk
        conv(x, tmp, "conv1/conv/kernel", 2, 3, 1, nullptr);
        if (ain) inorm(tmp, "conv1/in");
        else affine(tmp, "conv1/bn");
        relu(tmp);
        maxpool3x3s2p1(tmp, x);
        os_block(x, "conv2_0", channels_[1], ain, false);
        os_block(x, "conv2_1", channels_[1], ain, false);
        conv(x, tmp, "transition2/conv/kernel", 1, 0, 1, nullptr);
        affine(tmp, "transition2/bn");
        relu(tmp);
        avgpool2x2s2(tmp, x);
        os_block(x, "conv3_0", channels_[2], false, false);

        // branches (conv3_1 + transition3 + conv4_0 + conv4_1 + conv5);
        // AIN block pattern: conv3_1/conv4_0 use the IN-inside variant
        FMap glo = lmbn_branch(x, "global_branch", ain);
        FMap par = lmbn_branch(x, "partial_branch", ain);
        FMap cha = lmbn_branch(x, "channel_branch", ain);
        // Top-DB drop bottleneck; drop is train-only so glo_drop == glo
        os_block(glo, "drop_bottleneck", 512, false, false);

        // pooled heads
        std::vector<float> f[7];
        f[0] = bnneck3(gavg(glo, 0, glo.h), "reduction_0");
        f[1] = bnneck3(gmax(glo), "reduction_4");
        f[2] = bnneck3(gmax(par), "reduction_1");
        f[3] = bnneck3(gavg(par, 0, par.h / 2), "reduction_2");
        f[4] = bnneck3(gavg(par, par.h / 2, par.h), "reduction_3");
        // channel branch: pooled 512 split in half, shared 1x1 + BN + relu
        std::vector<float> c = gavg(cha, 0, cha.h);
        const int half = static_cast<int>(c.size()) / 2;
        f[5] = lmbn_channel_head(c.data(), half, "reduction_ch_0");
        f[6] = lmbn_channel_head(c.data() + half, half, "reduction_ch_1");

        // stack(dim=2).flatten: channel-major interleave (lmbn_n.py:128-132)
        const int C = 512;
        double norm = 0.0;
        for (int ch = 0; ch < C; ++ch)
            for (int k = 0; k < 7; ++k) {
                float v = f[k][static_cast<size_t>(ch)];
                out_feat[ch * 7 + k] = v;
                norm += static_cast<double>(v) * v;
            }
        float inv = static_cast<float>(1.0 / std::max(std::sqrt(norm), 1e-12));
        for (int i = 0; i < C * 7; ++i) out_feat[i] *= inv;
    }

    FMap lmbn_branch(const FMap& shared, const std::string& prefix, bool ain) const {
        FMap x = shared, tmp;
        os_block(x, prefix + "/conv3_1", channels_[2], ain, false);
        conv(x, tmp, prefix + "/transition3/conv/kernel", 1, 0, 1, nullptr);
        affine(tmp, prefix + "/transition3/bn");
        relu(tmp);
        avgpool2x2s2(tmp, x);
        os_block(x, prefix + "/conv4_0", channels_[3], ain, false);
        os_block(x, prefix + "/conv4_1", channels_[3], false, false);
        conv(x, tmp, prefix + "/conv5/conv/kernel", 1, 0, 1, nullptr);
        affine(tmp, prefix + "/conv5/bn");
        relu(tmp);
        return tmp;
    }

    // spatial mean over rows [y0, y1)
    static std::vector<float> gavg(const FMap& x, int y0, int y1) {
        std::vector<float> out(static_cast<size_t>(x.c), 0.0f);
        for (int y = y0; y < y1; ++y)
            for (int xx = 0; xx < x.w; ++xx) {
                const float* p = x.at(y, xx);
                for (int c = 0; c < x.c; ++c) out[static_cast<size_t>(c)] += p[c];
            }
        float inv = 1.0f / static_cast<float>(std::max((y1 - y0) * x.w, 1));
        for (float& v : out) v *= inv;
        return out;
    }

    static std::vector<float> gmax(const FMap& x) {
        std::vector<float> out(
            static_cast<size_t>(x.c), -std::numeric_limits<float>::infinity());
        for (int y = 0; y < x.h; ++y)
            for (int xx = 0; xx < x.w; ++xx) {
                const float* p = x.at(y, xx);
                for (int c = 0; c < x.c; ++c)
                    out[static_cast<size_t>(c)] = std::max(out[static_cast<size_t>(c)], p[c]);
            }
        return out;
    }

    // BNNeck3 (models/lmbn.py): bias-free Dense to 512 + folded BN
    std::vector<float> bnneck3(const std::vector<float>& v, const std::string& prefix) const {
        const NamedTensor& k = get(prefix + "/reduction/kernel");  // (in, 512)
        const NamedTensor& a = get(prefix + "/bn/a");
        const NamedTensor& b = get(prefix + "/bn/b");
        const int in_dim = k.shape[0], out_dim = k.shape[1];
        std::vector<float> out(static_cast<size_t>(out_dim), 0.0f);
        for (int ci = 0; ci < in_dim; ++ci) {
            float vv = v[static_cast<size_t>(ci)];
            const float* kp = k.data + static_cast<int64_t>(ci) * out_dim;
            for (int o = 0; o < out_dim; ++o) out[static_cast<size_t>(o)] += vv * kp[o];
        }
        for (int o = 0; o < out_dim; ++o)
            out[static_cast<size_t>(o)] = out[static_cast<size_t>(o)] * a.data[o] + b.data[o];
        return out;
    }

    // channel-branch head: shared fc (half -> 512) + shared BN + relu,
    // then the per-head BN-only neck (BNNeckBN)
    std::vector<float> lmbn_channel_head(const float* v, int in_dim,
                                         const std::string& neck) const {
        const NamedTensor& k = get("shared_fc/kernel");  // (half, 512)
        const NamedTensor& a = get("shared_bn/a");
        const NamedTensor& b = get("shared_bn/b");
        const int out_dim = k.shape[1];
        std::vector<float> out(static_cast<size_t>(out_dim), 0.0f);
        for (int ci = 0; ci < in_dim; ++ci) {
            const float* kp = k.data + static_cast<int64_t>(ci) * out_dim;
            for (int o = 0; o < out_dim; ++o) out[static_cast<size_t>(o)] += v[ci] * kp[o];
        }
        const NamedTensor& na = get(neck + "/bn/a");
        const NamedTensor& nb = get(neck + "/bn/b");
        for (int o = 0; o < out_dim; ++o) {
            float vv = std::max(out[static_cast<size_t>(o)] * a.data[o] + b.data[o], 0.0f);
            out[static_cast<size_t>(o)] = vv * na.data[o] + nb.data[o];
        }
        return out;
    }

    static std::vector<int> parse_ints(const std::string& s) {
        std::vector<int> out;
        std::istringstream ss(s);
        std::string item;
        while (std::getline(ss, item, ',')) out.push_back(std::atoi(item.c_str()));
        return out;
    }

    const NamedTensor& get(const std::string& name) const {
        auto it = tensors_.find(name);
        if (it == tensors_.end()) throw std::runtime_error("missing tensor " + name);
        return it->second;
    }
    bool has(const std::string& name) const { return tensors_.count(name) != 0; }

    // flax kernel layout (kh, kw, cin_per_group, cout), NHWC maps
    void conv(const FMap& in, FMap& out, const std::string& kernel_name, int stride,
              int pad, int groups, const float* bias) const {
        const NamedTensor& k = get(kernel_name);
        const int kh = k.shape[0], kw = k.shape[1], cin_g = k.shape[2], cout = k.shape[3];
        const int oh = (in.h + 2 * pad - kh) / stride + 1;
        const int ow = (in.w + 2 * pad - kw) / stride + 1;
        out.init(oh, ow, cout);
        const int per = cout / groups;
        for (int oy = 0; oy < oh; ++oy) {
            for (int ox = 0; ox < ow; ++ox) {
                float* acc = out.at(oy, ox);
                if (bias)
                    std::copy(bias, bias + cout, acc);
                for (int ky = 0; ky < kh; ++ky) {
                    int iy = oy * stride + ky - pad;
                    if (iy < 0 || iy >= in.h) continue;
                    for (int kx = 0; kx < kw; ++kx) {
                        int ix = ox * stride + kx - pad;
                        if (ix < 0 || ix >= in.w) continue;
                        const float* ip = in.at(iy, ix);
                        const float* kp = k.data +
                            (static_cast<int64_t>(ky) * kw + kx) * cin_g * cout;
                        if (groups == 1) {
                            for (int ci = 0; ci < cin_g; ++ci) {
                                float v = ip[ci];
                                const float* kc = kp + static_cast<int64_t>(ci) * cout;
                                for (int o = 0; o < cout; ++o) acc[o] += v * kc[o];
                            }
                        } else {
                            for (int o = 0; o < cout; ++o) {
                                int g = o / per;
                                float s = 0.0f;
                                for (int ci = 0; ci < cin_g; ++ci)
                                    s += ip[g * cin_g + ci] * kp[static_cast<int64_t>(ci) * cout + o];
                                acc[o] += s;
                            }
                        }
                    }
                }
            }
        }
    }

    void affine(FMap& x, const std::string& prefix) const {
        const NamedTensor& a = get(prefix + "/a");
        const NamedTensor& b = get(prefix + "/b");
        for (size_t i = 0; i < x.data.size(); ++i) {
            int ch = static_cast<int>(i % x.c);
            x.data[i] = x.data[i] * a.data[ch] + b.data[ch];
        }
    }

    // per-channel instance norm over spatial dims (flax GroupNorm with
    // group_size=1, eps 1e-5, biased variance)
    void inorm(FMap& x, const std::string& prefix) const {
        const NamedTensor& sc = get(prefix + "/scale");
        const NamedTensor& bi = get(prefix + "/bias");
        const float eps = 1e-5f;
        const int n = x.h * x.w;
        for (int ch = 0; ch < x.c; ++ch) {
            double s = 0.0, s2 = 0.0;
            for (int i = 0; i < n; ++i) {
                float v = x.data[static_cast<size_t>(i) * x.c + ch];
                s += v;
                s2 += static_cast<double>(v) * v;
            }
            float mean = static_cast<float>(s / n);
            float var = static_cast<float>(s2 / n) - mean * mean;
            float inv = sc.data[ch] / std::sqrt(std::max(var, 0.0f) + eps);
            float off = bi.data[ch] - mean * inv;
            for (int i = 0; i < n; ++i) {
                float& v = x.data[static_cast<size_t>(i) * x.c + ch];
                v = v * inv + off;
            }
        }
    }

    static void relu(FMap& x) {
        for (float& v : x.data) v = std::max(v, 0.0f);
    }

    static void maxpool3x3s2p1(const FMap& in, FMap& out) {
        const int oh = (in.h + 2 - 3) / 2 + 1, ow = (in.w + 2 - 3) / 2 + 1;
        out.init(oh, ow, in.c);
        for (int oy = 0; oy < oh; ++oy)
            for (int ox = 0; ox < ow; ++ox) {
                float* dst = out.at(oy, ox);
                std::fill(dst, dst + in.c, -std::numeric_limits<float>::infinity());
                for (int ky = 0; ky < 3; ++ky) {
                    int iy = oy * 2 + ky - 1;
                    if (iy < 0 || iy >= in.h) continue;
                    for (int kx = 0; kx < 3; ++kx) {
                        int ix = ox * 2 + kx - 1;
                        if (ix < 0 || ix >= in.w) continue;
                        const float* src = in.at(iy, ix);
                        for (int c = 0; c < in.c; ++c) dst[c] = std::max(dst[c], src[c]);
                    }
                }
            }
    }

    static void avgpool2x2s2(const FMap& in, FMap& out) {
        const int oh = in.h / 2, ow = in.w / 2;
        out.init(oh, ow, in.c);
        for (int oy = 0; oy < oh; ++oy)
            for (int ox = 0; ox < ow; ++ox) {
                float* dst = out.at(oy, ox);
                for (int ky = 0; ky < 2; ++ky)
                    for (int kx = 0; kx < 2; ++kx) {
                        const float* src = in.at(oy * 2 + ky, ox * 2 + kx);
                        for (int c = 0; c < in.c; ++c) dst[c] += src[c];
                    }
                for (int c = 0; c < in.c; ++c) dst[c] *= 0.25f;
            }
    }

    // omni-scale residual block (models/osnet.py OSBlock)
    void os_block(FMap& x, const std::string& name, int out_ch, bool in_inside,
                  bool ibn) const {
        FMap identity = x, x1, tmp;
        conv(x, x1, name + "/conv1/conv/kernel", 1, 0, 1, nullptr);
        affine(x1, name + "/conv1/bn");
        relu(x1);

        const NamedTensor& f1k = get(name + "/gate/fc1/kernel");
        const NamedTensor& f1b = get(name + "/gate/fc1/bias");
        const NamedTensor& f2k = get(name + "/gate/fc2/kernel");
        const NamedTensor& f2b = get(name + "/gate/fc2/bias");
        const int mid = x1.c, red = f1k.shape[3];

        FMap x2;
        x2.init(x1.h, x1.w, mid);
        FMap y;
        for (int t = 1; t <= 4; ++t) {
            y = x1;
            for (int u = 0; u < t; ++u) {
                std::string ln = name + "/conv2_" + std::to_string(t) + "_" + std::to_string(u);
                conv(y, tmp, ln + "/conv1/kernel", 1, 0, 1, nullptr);
                conv(tmp, y, ln + "/conv2/kernel", 1, 1, tmp.c, nullptr);
                affine(y, ln + "/bn");
                relu(y);
            }
            // shared channel gate: squeeze-excite with sigmoid
            std::vector<float> s(static_cast<size_t>(mid), 0.0f);
            for (int i = 0; i < y.h * y.w; ++i)
                for (int c = 0; c < mid; ++c)
                    s[static_cast<size_t>(c)] += y.data[static_cast<size_t>(i) * mid + c];
            float inv = 1.0f / static_cast<float>(y.h * y.w);
            for (float& v : s) v *= inv;
            std::vector<float> r(static_cast<size_t>(red));
            for (int o = 0; o < red; ++o) {
                float acc = f1b.data[o];
                for (int ci = 0; ci < mid; ++ci)
                    acc += s[static_cast<size_t>(ci)] * f1k.data[static_cast<int64_t>(ci) * red + o];
                r[static_cast<size_t>(o)] = std::max(acc, 0.0f);
            }
            std::vector<float> g(static_cast<size_t>(mid));
            for (int o = 0; o < mid; ++o) {
                float acc = f2b.data[o];
                for (int ci = 0; ci < red; ++ci)
                    acc += r[static_cast<size_t>(ci)] * f2k.data[static_cast<int64_t>(ci) * mid + o];
                g[static_cast<size_t>(o)] = 1.0f / (1.0f + std::exp(-acc));
            }
            for (int i = 0; i < y.h * y.w; ++i)
                for (int c = 0; c < mid; ++c)
                    x2.data[static_cast<size_t>(i) * mid + c] +=
                        y.data[static_cast<size_t>(i) * mid + c] * g[static_cast<size_t>(c)];
        }

        FMap x3;
        if (in_inside) {
            conv(x2, x3, name + "/conv3/kernel", 1, 0, 1, nullptr);
            inorm(x3, name + "/in3");
        } else {
            conv(x2, x3, name + "/conv3/conv/kernel", 1, 0, 1, nullptr);
            affine(x3, name + "/conv3/bn");
        }
        if (identity.c != out_ch) {
            conv(identity, tmp, name + "/downsample/conv/kernel", 1, 0, 1, nullptr);
            affine(tmp, name + "/downsample/bn");
            identity = tmp;
        }
        for (size_t i = 0; i < x3.data.size(); ++i) x3.data[i] += identity.data[i];
        if (ibn) inorm(x3, name + "/ibn");
        relu(x3);
        x = x3;
    }

    std::vector<int> channels_, blocks_;
    std::vector<std::vector<std::string>> block_types_;
    std::string arch_ = "osnet";
    int ain_ = 0;
    int feature_dim_ = 0;
    int conv1_in_ = 0, ibn_ = 0;
    int crop_h_ = 256, crop_w_ = 128;
    std::vector<float> blob_;
    std::unordered_map<std::string, NamedTensor> tensors_;
};

}  // namespace boxmot

#endif  // BOXMOT_REID_NET_HPP
