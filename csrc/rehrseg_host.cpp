// rehrseg_host: native host-side kernels for the REHRSeg-TPU data pipeline.
//
// The reference delegates this work to scipy/nibabel C internals
// (SURVEY.md §2.2); here the hot host-side numerics get a dedicated C++
// implementation exposed through ctypes (no pybind11 in this image):
//
//   - gzip inflate (zlib) for .nii.gz payloads
//   - cubic B-spline prefilter (exact causal/anticausal IIR, mirror
//     boundary — matches scipy.ndimage.spline_filter1d(order=3,
//     mode='mirror'))
//   - separable 1-D 'same' zero-padded convolution (slice-profile blur)
//   - 1-D resize as a precomputed-matrix apply (out = M @ x along an axis)
//
// All array ops take contiguous float32 buffers with the processed axis
// described by (outer, n, inner) strides: arr[o, i, j] at o*n*inner +
// i*inner + j.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------- gzip

// Inflate a gzip stream. Returns the number of bytes written to out, or -1
// on error, or -2 if out_capacity is too small.
int64_t rh_gunzip(const uint8_t* in, int64_t in_len, uint8_t* out,
                  int64_t out_capacity) {
    // zlib's single-shot lengths are 32-bit uInt; a silent truncation here
    // made avail_out wrap to 0 for >=4 GiB capacities (the Python caller
    // then grew the buffer forever). Refuse instead: -1 routes the caller
    // to the streaming gzip-module fallback, which handles any size.
    if (in_len < 0 || in_len > static_cast<int64_t>(UINT32_MAX) ||
        out_capacity < 0 || out_capacity > static_cast<int64_t>(UINT32_MAX))
        return -1;
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return -1;
    zs.next_in = const_cast<Bytef*>(in);
    zs.avail_in = static_cast<uInt>(in_len);
    zs.next_out = out;
    zs.avail_out = static_cast<uInt>(out_capacity);
    int ret = inflate(&zs, Z_FINISH);
    int64_t written = static_cast<int64_t>(zs.total_out);
    uInt out_left = zs.avail_out;
    inflateEnd(&zs);
    if (ret == Z_STREAM_END) return written;
    // Z_BUF_ERROR with output space remaining means the INPUT ran dry
    // (truncated/corrupt stream) — growing the buffer cannot fix that.
    if (ret == Z_BUF_ERROR && out_left == 0) return -2;
    return -1;
}

// Deflate to gzip format. Returns bytes written or -1.
int64_t rh_gzip(const uint8_t* in, int64_t in_len, uint8_t* out,
                int64_t out_capacity, int level) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, level, Z_DEFLATED, 16 + MAX_WBITS, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
        return -1;
    zs.next_in = const_cast<Bytef*>(in);
    zs.avail_in = static_cast<uInt>(in_len);
    zs.next_out = out;
    zs.avail_out = static_cast<uInt>(out_capacity);
    int ret = deflate(&zs, Z_FINISH);
    int64_t written = static_cast<int64_t>(zs.total_out);
    deflateEnd(&zs);
    return ret == Z_STREAM_END ? written : -1;
}

// ------------------------------------------------- cubic B-spline prefilter

// Exact IIR prefilter for cubic B-spline interpolation with mirror
// ('reflect about the first/last sample') boundary, the scipy.ndimage
// convention. Pole z1 = sqrt(3) - 2.
static void spline_filter_line(float* c, int64_t n, int64_t stride) {
    if (n < 2) return;
    const double z1 = -0.26794919243112270647;  // sqrt(3) - 2
    const double lambda = (1.0 - z1) * (1.0 - 1.0 / z1);
    // causal init: mirror boundary sum c0 = sum z1^k x[k] over mirrored signal
    // truncated at machine precision
    int64_t horizon = static_cast<int64_t>(
        std::ceil(std::log(1e-15) / std::log(std::fabs(z1))));
    double sum;
    if (horizon < 2 * (n - 1)) {
        sum = static_cast<double>(c[0]);
        double zn = z1;
        for (int64_t k = 1; k <= horizon; ++k) {
            // mirror index: period 2(n-1)
            int64_t m = k % (2 * (n - 1));
            if (m >= n) m = 2 * (n - 1) - m;
            sum += zn * static_cast<double>(c[m * stride]);
            zn *= z1;
        }
    } else {
        // full closed form over one period
        double zn = z1, z2n = std::pow(z1, static_cast<double>(n - 1));
        double iz = 1.0 / z1;
        sum = c[0] + z2n * c[(n - 1) * stride];
        z2n *= z2n * iz;
        for (int64_t k = 1; k < n - 1; ++k) {
            sum += (zn + z2n) * c[k * stride];
            zn *= z1;
            z2n *= iz;
        }
        sum /= (1.0 - std::pow(z1, static_cast<double>(2 * n - 2)));
    }
    // causal recursion (scaled by lambda)
    double prev = sum * lambda;
    c[0] = static_cast<float>(prev);
    for (int64_t k = 1; k < n; ++k) {
        prev = lambda * static_cast<double>(c[k * stride]) + z1 * prev;
        c[k * stride] = static_cast<float>(prev);
    }
    // anticausal init
    double last = static_cast<double>(c[(n - 1) * stride]);
    double last2 = static_cast<double>(c[(n - 2) * stride]);
    double cn = (z1 / (z1 * z1 - 1.0)) * (z1 * last2 + last);
    c[(n - 1) * stride] = static_cast<float>(cn);
    for (int64_t k = n - 2; k >= 0; --k) {
        cn = z1 * (cn - static_cast<double>(c[k * stride]));
        c[k * stride] = static_cast<float>(cn);
    }
}

void rh_spline_filter_axis(float* data, int64_t outer, int64_t n,
                           int64_t inner) {
    for (int64_t o = 0; o < outer; ++o) {
        float* base = data + o * n * inner;
        for (int64_t j = 0; j < inner; ++j) {
            spline_filter_line(base + j, n, inner);
        }
    }
}

// ------------------------------------------------------ separable 1-D blur

// 'same' zero-padded cross-correlation along the middle axis.
void rh_blur_axis(const float* in, float* out, const float* kernel,
                  int64_t klen, int64_t outer, int64_t n, int64_t inner) {
    int64_t half = klen / 2;
    for (int64_t o = 0; o < outer; ++o) {
        const float* ib = in + o * n * inner;
        float* ob = out + o * n * inner;
        for (int64_t i = 0; i < n; ++i) {
            int64_t k0 = i - half;
            int64_t kstart = k0 < 0 ? -k0 : 0;
            int64_t kend = (k0 + klen > n) ? (n - k0) : klen;
            for (int64_t j = 0; j < inner; ++j) {
                double acc = 0.0;
                for (int64_t k = kstart; k < kend; ++k) {
                    acc += static_cast<double>(kernel[k]) *
                           static_cast<double>(ib[(k0 + k) * inner + j]);
                }
                ob[i * inner + j] = static_cast<float>(acc);
            }
        }
    }
}

// -------------------------------------------------- matrix resize (1 axis)

// out[o, m, j] = sum_k M[m, k] * in[o, k, j]
void rh_resize_axis(const float* in, float* out, const float* M,
                    int64_t m, int64_t n, int64_t outer, int64_t inner) {
    for (int64_t o = 0; o < outer; ++o) {
        const float* ib = in + o * n * inner;
        float* ob = out + o * m * inner;
        for (int64_t r = 0; r < m; ++r) {
            const float* Mr = M + r * n;
            for (int64_t j = 0; j < inner; ++j) ob[r * inner + j] = 0.0f;
            for (int64_t k = 0; k < n; ++k) {
                float w = Mr[k];
                if (w == 0.0f) continue;
                const float* ik = ib + k * inner;
                float* orow = ob + r * inner;
                for (int64_t j = 0; j < inner; ++j) orow[j] += w * ik[j];
            }
        }
    }
}

// ------------------------------------------------------------ zscore (fast)

void rh_zscore(float* data, int64_t n) {
    double mean = 0.0;
    for (int64_t i = 0; i < n; ++i) mean += data[i];
    mean /= static_cast<double>(n);
    double var = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double d = data[i] - mean;
        var += d * d;
    }
    double std = std::sqrt(var / static_cast<double>(n));
    if (std < 1e-8) std = 1e-8;
    float fm = static_cast<float>(mean), fs = static_cast<float>(1.0 / std);
    for (int64_t i = 0; i < n; ++i) data[i] = (data[i] - fm) * fs;
}

}  // extern "C"
