/* audiodec implementation. See audiodec.h for the component contract. */

#include "audiodec.h"

#include <algorithm>
#include <cmath>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <numeric>
#include <string>
#include <thread>
#include <vector>

/* ---- wav decoding ------------------------------------------------------- */

static uint32_t rd_u32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
    return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

int64_t adc_decode_wav(const uint8_t* data, size_t size, float* out,
                       int64_t out_capacity, int32_t* sample_rate_out) {
    if (size < 44 || memcmp(data, "RIFF", 4) || memcmp(data + 8, "WAVE", 4))
        return -1;
    size_t pos = 12;
    uint16_t fmt = 0, channels = 0, bits = 0;
    int32_t rate = 0;
    const uint8_t* pcm = nullptr;
    size_t pcm_size = 0;
    while (pos + 8 <= size) {
        const uint8_t* hdr = data + pos;
        uint32_t chunk_size = rd_u32(hdr + 4);
        const uint8_t* body = hdr + 8;
        size_t body_avail = size - (pos + 8);
        /* the fmt fields are only read when the 16-byte body actually
         * fits in the buffer — a truncated file whose fmt header sits at
         * the end would otherwise read past it */
        if (!memcmp(hdr, "fmt ", 4) && chunk_size >= 16 &&
            body_avail >= 16) {
            fmt = rd_u16(body);
            channels = rd_u16(body + 2);
            rate = (int32_t)rd_u32(body + 4);
            bits = rd_u16(body + 14);
        } else if (!memcmp(hdr, "data", 4)) {
            pcm = body;
            pcm_size = std::min((size_t)chunk_size, size - (pos + 8));
        }
        pos += 8 + chunk_size + (chunk_size & 1);
    }
    if (!pcm || !channels || !rate) return -1;
    if (fmt != 1 && fmt != 3) return -1; /* PCM or IEEE float */

    size_t bytes_per = bits / 8;
    if (!bytes_per) return -1;
    int64_t frames = (int64_t)(pcm_size / (bytes_per * channels));
    int64_t n = std::min(frames, out_capacity);
    /* int16 PCM fast paths (the overwhelmingly common on-disk format):
     * branch-free per-sample loops the compiler vectorizes (int16 ->
     * float convert + scale), vs the generic per-sample format dispatch
     * below. Keeps the classifier's host input pipeline from being the
     * training bottleneck (VERDICT r3 next #8). */
    if (fmt == 1 && bits == 16 && channels == 1) {
        const float s = 1.0f / 32768.0f;
        for (int64_t i = 0; i < n; i++)
            out[i] = (float)(int16_t)rd_u16(pcm + 2 * i) * s;
        if (sample_rate_out) *sample_rate_out = rate;
        return n;
    }
    if (fmt == 1 && bits == 16 && channels == 2) {
        const float s = 0.5f / 32768.0f; /* mono mixdown: mean of L/R */
        for (int64_t i = 0; i < n; i++) {
            float l = (float)(int16_t)rd_u16(pcm + 4 * i);
            float r = (float)(int16_t)rd_u16(pcm + 4 * i + 2);
            out[i] = (l + r) * s;
        }
        if (sample_rate_out) *sample_rate_out = rate;
        return n;
    }
    for (int64_t i = 0; i < n; i++) {
        double acc = 0.0;
        for (int c = 0; c < channels; c++) {
            const uint8_t* s = pcm + (i * channels + c) * bytes_per;
            double v = 0.0;
            if (fmt == 3 && bits == 32) {
                float f;
                memcpy(&f, s, 4);
                v = f;
            } else if (bits == 16) {
                int16_t x = (int16_t)rd_u16(s);
                v = x / 32768.0;
            } else if (bits == 32) {
                int32_t x = (int32_t)rd_u32(s);
                v = x / 2147483648.0;
            } else if (bits == 24) {
                int32_t x = (int32_t)((uint32_t)s[0] << 8 |
                                      (uint32_t)s[1] << 16 |
                                      (uint32_t)s[2] << 24);
                v = (x >> 8) / 8388608.0;
            } else if (bits == 8) {
                v = ((int)s[0] - 128) / 128.0;
            } else {
                return -1;
            }
            acc += v;
        }
        out[i] = (float)(acc / channels);
    }
    if (sample_rate_out) *sample_rate_out = rate;
    return n;
}

/* ---- resampling --------------------------------------------------------- */

static double bessel_i0(double x) {
    /* series expansion, converges fast for the beta range we use */
    double sum = 1.0, term = 1.0;
    double hx = x / 2.0;
    for (int k = 1; k < 64; k++) {
        term *= (hx / k) * (hx / k);
        sum += term;
        if (term < 1e-16 * sum) break;
    }
    return sum;
}

struct ResampleFilter {
    std::vector<double> h;
    /* phase-major taps, REVERSED within each phase:
     * rpoly[p][m] = h[p + (len-1-m)*up]. Contiguous per phase and stored
     * so the inner product walks BOTH the taps and the input ascending —
     * a dense dot product (the strided h[base - k*up] walk of the naive
     * formulation defeats vectorization and prefetch).
     *
     * flat: the same rows FRONT-padded with zeros to one fixed length
     * `row_len` (multiple of 8) and packed contiguously (row p at
     * flat[p * row_len]). Against a zero-padded input buffer every
     * output is then one fixed-length dot with no per-output boundary
     * clamping and no vector tail — the form the SIMD dot needs. */
    std::vector<std::vector<float>> rpoly;
    std::vector<float> flat;
    int64_t row_len;
    int up, down, half_len;
};

/* scipy.signal.resample_poly-compatible filter: firwin(2*half+1, fc,
 * kaiser(5.0)) * up, half = 10*max(up,down), fc = 1/max(up,down) of the
 * upsampled Nyquist. */
static ResampleFilter design_filter(int in_rate, int out_rate) {
    int g = (int)std::gcd(in_rate, out_rate);
    int up = out_rate / g, down = in_rate / g;
    int m = std::max(up, down);
    int half = 10 * m;
    int taps = 2 * half + 1;
    double fc = 1.0 / m; /* normalized to Nyquist of upsampled signal */
    double beta = 5.0;
    std::vector<double> h(taps);
    double i0b = bessel_i0(beta);
    double sum = 0.0;
    for (int i = 0; i < taps; i++) {
        double t = i - half;
        double sinc = (t == 0.0) ? 1.0
                                 : std::sin(M_PI * fc * t) / (M_PI * fc * t);
        double r = t / half;
        double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r)))
                   / i0b;
        h[i] = fc * sinc * w;
        sum += h[i];
    }
    /* firwin normalizes DC gain to 1, then resample_poly scales by up */
    for (auto& v : h) v = v / sum * up;
    std::vector<std::vector<float>> rpoly((size_t)up);
    size_t max_len = 0;
    for (int p = 0; p < up; p++) {
        for (int j = p; j < taps; j += up)
            rpoly[(size_t)p].push_back((float)h[j]);
        std::reverse(rpoly[(size_t)p].begin(), rpoly[(size_t)p].end());
        max_len = std::max(max_len, rpoly[(size_t)p].size());
    }
    int64_t row_len = (int64_t)((max_len + 7) / 8 * 8);
    std::vector<float> flat((size_t)row_len * up, 0.0f);
    for (int p = 0; p < up; p++) {
        const auto& row = rpoly[(size_t)p];
        /* front padding: row[m] pairs with input sample
         * k0 - len + 1 + m, so (row_len - len) leading zeros shift the
         * window start back to k0 - row_len + 1 without changing the
         * sum — the padded input buffer supplies zeros there too. */
        std::copy(row.begin(), row.end(),
                  flat.begin() + (size_t)(p * row_len)
                      + (size_t)(row_len - (int64_t)row.size()));
    }
    return {std::move(h), std::move(rpoly), std::move(flat), row_len,
            up, down, half};
}

int64_t adc_resample_out_len(int64_t in_len, int32_t in_rate,
                             int32_t out_rate) {
    if (in_rate == out_rate) return in_len;
    int64_t g = std::gcd((int64_t)in_rate, (int64_t)out_rate);
    int64_t up = out_rate / g, down = in_rate / g;
    return (in_len * up + down - 1) / down;
}

/* Filter design costs ~1 ms (thousands of Kaiser-windowed taps, e.g. 8821
 * for 22050->16000) and depends only on the rate pair — cache per thread
 * (lock-free; pool workers each keep their own copy). */
static const ResampleFilter& cached_filter(int32_t in_rate,
                                           int32_t out_rate) {
    thread_local std::map<uint64_t, ResampleFilter> cache;
    uint64_t key = ((uint64_t)(uint32_t)in_rate << 32)
                   | (uint32_t)out_rate;
    auto it = cache.find(key);
    if (it == cache.end())
        it = cache.emplace(key, design_filter(in_rate, out_rate)).first;
    return it->second;
}

/* The polyphase dot product. Ascending walk over both streams with four
 * independent accumulators: float adds aren't reassociable by the
 * compiler, so the unroll is manual (the 2e-4-vs-scipy parity budget
 * absorbs the reordering). Measured 1.48 -> 0.82 ms per 4 s
 * 22.05k->16k clip vs the old descending-walk loop.
 *
 * SIMD: runtime ifunc clones were tried in round 3 and lose their gains
 * to per-call dispatch at the ~28-tap dot lengths polyphase filters
 * produce — so the AVX2+FMA variant is selected at COMPILE time instead
 * (the Makefile builds with -march=native; the library is auto-built on
 * the machine that uses it, data/native_loader.py). Together with the
 * fixed-length zero-padded rows (count always a multiple of 8) the hot
 * path is pure 8-wide FMAs with one horizontal sum and no tail. */
#if defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
static inline float dot_f32(const float* hp, const float* xp, int64_t count) {
    __m256 acc0 = _mm256_setzero_ps(), acc1 = _mm256_setzero_ps();
    int64_t r = 0;
    for (; r + 16 <= count; r += 16) {
        acc0 = _mm256_fmadd_ps(_mm256_loadu_ps(hp + r),
                               _mm256_loadu_ps(xp + r), acc0);
        acc1 = _mm256_fmadd_ps(_mm256_loadu_ps(hp + r + 8),
                               _mm256_loadu_ps(xp + r + 8), acc1);
    }
    for (; r + 8 <= count; r += 8)
        acc0 = _mm256_fmadd_ps(_mm256_loadu_ps(hp + r),
                               _mm256_loadu_ps(xp + r), acc0);
    __m256 acc = _mm256_add_ps(acc0, acc1);
    __m128 s = _mm_add_ps(_mm256_castps256_ps128(acc),
                          _mm256_extractf128_ps(acc, 1));
    s = _mm_add_ps(s, _mm_movehl_ps(s, s));
    s = _mm_add_ss(s, _mm_shuffle_ps(s, s, 1));
    float out = _mm_cvtss_f32(s);
    for (; r < count; r++) out += hp[r] * xp[r];
    return out;
}
#else
static inline float dot_f32(const float* hp, const float* xp, int64_t count) {
    float a0 = 0.0f, a1 = 0.0f, a2 = 0.0f, a3 = 0.0f;
    int64_t r = 0;
    for (; r + 4 <= count; r += 4) {
        a0 += hp[r] * xp[r];
        a1 += hp[r + 1] * xp[r + 1];
        a2 += hp[r + 2] * xp[r + 2];
        a3 += hp[r + 3] * xp[r + 3];
    }
    for (; r < count; r++) a0 += hp[r] * xp[r];
    return (a0 + a1) + (a2 + a3);
}
#endif

int64_t adc_resample(const float* in, int64_t in_len, int32_t in_rate,
                     int32_t out_rate, float* out, int64_t out_capacity) {
    if (in_rate == out_rate) {
        int64_t n = std::min(in_len, out_capacity);
        memcpy(out, in, (size_t)n * sizeof(float));
        return n;
    }
    const ResampleFilter& f = cached_filter(in_rate, out_rate);
    int64_t n_out = adc_resample_out_len(in_len, in_rate, out_rate);
    n_out = std::min(n_out, out_capacity);
    /* Zero-pad the input once (row_len-1 zeros in front, enough behind
     * for the last window) so every output is ONE fixed-length dot
     * against its phase row — no per-output boundary clamping, and the
     * count is a multiple of 8 for the SIMD dot. The padding zeros pair
     * with the rows' front-padding zeros and out-of-range taps, adding
     * exact 0.0f terms, so results match the clamped walk bit-for-bit
     * up to the dot's own accumulation order. */
    int64_t pad = f.row_len - 1;
    int64_t k0_max = ((n_out - 1) * (int64_t)f.down + f.half_len) / f.up;
    thread_local std::vector<float> inpad;
    inpad.assign((size_t)(std::max(pad + in_len, k0_max + f.row_len)),
                 0.0f);
    memcpy(inpad.data() + pad, in, (size_t)in_len * sizeof(float));
    for (int64_t n = 0; n < n_out; n++) {
        /* output n sits at upsampled index n*down; filter centered
         * there. Tap index j = base - k*up keeps j ≡ base (mod up):
         * exactly the phase-major row flat[base % up], walked densely
         * (REVERSED, so both streams ascend) while the padded input
         * window starts at k0 = floor(base/up). */
        int64_t base = n * (int64_t)f.down + f.half_len;
        int64_t phase = base % f.up;
        int64_t k0 = base / f.up;
        out[n] = dot_f32(f.flat.data() + (size_t)(phase * f.row_len),
                         inpad.data() + k0, f.row_len);
    }
    return n_out;
}

/* ---- clip preprocessing -------------------------------------------------- */

void adc_pad_normalize(const float* in, int64_t in_len, float* out,
                       int64_t target_len, int normalize) {
    int64_t n = std::min(in_len, target_len);
    memcpy(out, in, (size_t)n * sizeof(float));
    if (n < target_len)
        memset(out + n, 0, (size_t)(target_len - n) * sizeof(float));
    if (normalize) {
        float peak = 0.0f;
        for (int64_t i = 0; i < n; i++) peak = std::max(peak, std::fabs(out[i]));
        if (peak > 0.0f) {
            float inv = 1.0f / peak;
            for (int64_t i = 0; i < n; i++) out[i] *= inv;
        }
    }
}

/* ---- prefetch pool ------------------------------------------------------- */

struct PoolItem {
    std::string path;
    int64_t tag;
    int64_t seq;
};

struct PoolResult {
    std::vector<float> clip;
    int64_t tag;
    int ok;
};

/* Upper bound on the decoded (mono) sample count of a container, from its
 * headers, so workers size decode buffers to the file instead of a fixed
 * 115 MB (48000*600 floats) high-water mark per thread:
 *   wav:  mono frames <= pcm bytes (>= 1 byte/sample/channel)
 *   flac: STREAMINFO total_samples (36-bit); highly-compressed streams
 *         can exceed their byte size many times over, so the header field
 *         is the only safe bound (0 = unknown -> fall back to the cap)
 * Everything is clamped to the legacy 10-minutes-at-48kHz cap, which
 * remains the pool's documented truncation point for pathological input. */
static int64_t decoded_len_bound(const uint8_t* data, size_t size) {
    const int64_t cap = 48000ll * 600ll;
    if (size >= 8 && !memcmp(data, "fLaC", 4)) {
        /* STREAMINFO is the first metadata block when present */
        if (size >= 4 + 4 + 34 && (data[4] & 0x7F) == 0) {
            const uint8_t* b = data + 8;
            int64_t total = ((int64_t)(b[13] & 0x0F) << 32)
                            | ((int64_t)b[14] << 24) | ((int64_t)b[15] << 16)
                            | ((int64_t)b[16] << 8) | (int64_t)b[17];
            if (total > 0) return std::min(total, cap);
        }
        return cap;
    }
    return std::min((int64_t)size, cap);
}

struct adc_pool {
    int32_t target_rate;
    int64_t target_len;
    int normalize;
    int capacity;

    std::mutex mu;
    std::condition_variable cv_work, cv_done;
    std::deque<PoolItem> work;
    std::map<int64_t, PoolResult> done;
    int64_t next_submit = 0, next_pop = 0;
    bool shutdown = false;
    std::vector<std::thread> threads;

    int decode_item(const std::vector<uint8_t>& file_buf,
                    std::vector<float>& decode_buf,
                    std::vector<float>& resamp_buf, PoolResult& res) {
        int32_t rate = 0;
        int64_t bound = decoded_len_bound(file_buf.data(), file_buf.size());
        if (bound <= 0) return -1;
        decode_buf.resize((size_t)bound);
        int64_t n = adc_decode_audio(file_buf.data(), file_buf.size(),
                                     decode_buf.data(),
                                     (int64_t)decode_buf.size(), &rate);
        if (n <= 0) return -1;
        const float* src = decode_buf.data();
        int64_t src_len = n;
        if (rate != target_rate) {
            resamp_buf.resize((size_t)adc_resample_out_len(
                n, rate, target_rate));
            src_len = adc_resample(decode_buf.data(), n, rate, target_rate,
                                   resamp_buf.data(),
                                   (int64_t)resamp_buf.size());
            src = resamp_buf.data();
        }
        adc_pad_normalize(src, src_len, res.clip.data(), target_len,
                          normalize);
        return 0;
    }

    void worker() {
        std::vector<uint8_t> file_buf;
        std::vector<float> decode_buf, resamp_buf;
        for (;;) {
            PoolItem item;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_work.wait(lk, [&] { return shutdown || !work.empty(); });
                if (shutdown && work.empty()) return;
                item = work.front();
                work.pop_front();
            }
            PoolResult res;
            res.tag = item.tag;
            res.ok = -1;
            res.clip.assign((size_t)target_len, 0.0f);

            /* The pool contract (audiodec.h): ONE bad row yields rc=-1
             * with its tag, never a dead worker or a dead process. A
             * directory path makes ftell report LONG_MAX (resize would
             * throw bad_alloc, and an exception escaping this detached
             * thread is std::terminate), so the size is validated and
             * the whole item is wrapped. */
            try {
                FILE* fp = fopen(item.path.c_str(), "rb");
                if (fp) {
                    fseek(fp, 0, SEEK_END);
                    long fsize = ftell(fp);
                    fseek(fp, 0, SEEK_SET);
                    if (fsize > 0 && fsize <= (1L << 30)) {
                        file_buf.resize((size_t)fsize);
                        if (fread(file_buf.data(), 1, (size_t)fsize, fp) ==
                            (size_t)fsize) {
                            res.ok = decode_item(file_buf, decode_buf,
                                                 resamp_buf, res);
                        }
                    }
                    fclose(fp);
                }
            } catch (const std::exception&) {
                res.ok = -1;
            }
            {
                std::lock_guard<std::mutex> lk(mu);
                done.emplace(item.seq, std::move(res));
            }
            cv_done.notify_all();
        }
    }
};

adc_pool* adc_pool_create(int num_threads, int32_t target_rate,
                          int64_t target_len, int normalize, int capacity) {
    auto* p = new adc_pool();
    p->target_rate = target_rate;
    p->target_len = target_len;
    p->normalize = normalize;
    p->capacity = capacity > 0 ? capacity : 64;
    int n = num_threads > 0 ? num_threads : 1;
    for (int i = 0; i < n; i++)
        p->threads.emplace_back([p] { p->worker(); });
    return p;
}

int adc_pool_submit(adc_pool* p, const char* path, int64_t tag) {
    {
        std::lock_guard<std::mutex> lk(p->mu);
        if ((int)(p->next_submit - p->next_pop) >= p->capacity) return -1;
        p->work.push_back({path, tag, p->next_submit});
        p->next_submit++;
    }
    p->cv_work.notify_one();
    return 0;
}

int adc_pool_pop(adc_pool* p, float* out, int64_t* tag_out) {
    std::unique_lock<std::mutex> lk(p->mu);
    if (p->next_pop >= p->next_submit) return -2;
    /* claim the seq BEFORE waiting: two concurrent pops must take
     * distinct seqs, or the loser waits forever on a result the winner
     * already consumed and erased */
    int64_t seq = p->next_pop++;
    p->cv_done.wait(lk, [&] { return p->done.count(seq) > 0; });
    PoolResult res = std::move(p->done[seq]);
    p->done.erase(seq);
    lk.unlock();
    memcpy(out, res.clip.data(), (size_t)p->target_len * sizeof(float));
    if (tag_out) *tag_out = res.tag;
    return res.ok;
}

int adc_pool_pending(adc_pool* p) {
    std::lock_guard<std::mutex> lk(p->mu);
    return (int)(p->next_submit - p->next_pop);
}

void adc_pool_destroy(adc_pool* p) {
    {
        std::lock_guard<std::mutex> lk(p->mu);
        p->shutdown = true;
    }
    p->cv_work.notify_all();
    for (auto& t : p->threads) t.join();
    delete p;
}
