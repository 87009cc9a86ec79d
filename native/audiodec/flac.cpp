/* First-party FLAC decoder (mono-mixdown to float, same contract as
 * adc_decode_wav). The reference accepts flac uploads through librosa's
 * libsndfile path (reference: whisper_finetune/streamlit_app.py:30,64-68);
 * this is the TPU framework's native equivalent for the host data/serving
 * pipeline.
 *
 * Coverage: the full mandatory decode surface — CONSTANT / VERBATIM /
 * FIXED(0-4) / LPC(1-32) subframes, Rice and Rice2 residual partitions
 * (incl. escape codes), wasted bits, left-side / right-side / mid-side
 * stereo decorrelation, 8/12/16/20/24/32-bit sample sizes, fixed and
 * variable blocking. Frame CRCs are skipped (tolerant decode); the
 * encoder-side CRCs live in the test fixture generator
 * (tests/flac_encoder.py), which round-trips losslessly against this.
 */

#include "audiodec.h"

#include <algorithm>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;        /* bytes */
    size_t byte = 0;
    int bit = 0;        /* 0..7, MSB-first */
    bool overrun = false;

    BitReader(const uint8_t* d, size_t s) : data(d), size(s) {}

    bool eof() const { return byte >= size; }

    uint32_t read_bit() {
        if (byte >= size) { overrun = true; return 0; }
        uint32_t b = (data[byte] >> (7 - bit)) & 1u;
        if (++bit == 8) { bit = 0; byte++; }
        return b;
    }

    uint64_t read_bits(int n) {  /* n <= 57 */
        uint64_t v = 0;
        while (n > 0) {
            if (byte >= size) { overrun = true; return 0; }
            int avail = 8 - bit;
            int take = std::min(avail, n);
            uint32_t cur = data[byte];
            uint32_t chunk = (cur >> (avail - take)) & ((1u << take) - 1u);
            v = (v << take) | chunk;
            bit += take;
            n -= take;
            if (bit == 8) { bit = 0; byte++; }
        }
        return v;
    }

    int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        if (n == 0) return 0;
        if (v & (1ull << (n - 1))) return (int64_t)(v - (1ull << n));
        return (int64_t)v;
    }

    /* FLAC unary: count of 0 bits terminated by a 1. */
    uint32_t read_unary() {
        uint32_t q = 0;
        while (!overrun && read_bit() == 0) {
            q++;
            if (q > 1u << 24) { overrun = true; break; }  /* corrupt */
        }
        return q;
    }

    void align() {
        if (bit) { bit = 0; byte++; }
    }
};

/* Rice residual into res[0..n), parameterized 4- or 5-bit params. */
bool read_residual(BitReader& br, int order, int blocksize,
                   std::vector<int64_t>& res) {
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    int plen = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t part_order = (uint32_t)br.read_bits(4);
    uint32_t nparts = 1u << part_order;
    if (blocksize % (int)nparts) return false;
    int psize = blocksize >> part_order;
    if (psize <= 0 || psize < order) return false;
    size_t idx = 0;
    for (uint32_t p = 0; p < nparts; p++) {
        int count = psize - (p == 0 ? order : 0);
        if (count < 0) return false;
        uint32_t param = (uint32_t)br.read_bits(plen);
        if (param == escape) {
            int raw = (int)br.read_bits(5);
            for (int i = 0; i < count; i++)
                res[idx++] = raw ? br.read_signed(raw) : 0;
        } else {
            for (int i = 0; i < count; i++) {
                uint32_t q = br.read_unary();
                uint64_t low = br.read_bits((int)param);
                uint64_t v = ((uint64_t)q << param) | low;
                res[idx++] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
            }
        }
        if (br.overrun) return false;
    }
    return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& out) {
    if (br.read_bit() != 0) return false;  /* padding bit */
    uint32_t type = (uint32_t)br.read_bits(6);
    int wasted = 0;
    if (br.read_bit()) wasted = (int)br.read_unary() + 1;
    bps -= wasted;
    if (bps <= 0 || bps > 33) return false;

    out.assign((size_t)blocksize, 0);
    if (type == 0) {                       /* CONSTANT */
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < blocksize; i++) out[(size_t)i] = v;
    } else if (type == 1) {                /* VERBATIM */
        for (int i = 0; i < blocksize; i++)
            out[(size_t)i] = br.read_signed(bps);
    } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) { /* FIXED */
        int order = (int)(type & 0x07);
        if (order > blocksize) return false;
        for (int i = 0; i < order; i++)
            out[(size_t)i] = br.read_signed(bps);
        std::vector<int64_t> res((size_t)blocksize);
        if (!read_residual(br, order, blocksize, res)) return false;
        /* residuals fill res[0 .. blocksize-order) */
        switch (order) {
            case 0:
                for (int i = 0; i < blocksize; i++)
                    out[(size_t)i] = res[(size_t)i];
                break;
            case 1:
                for (int i = 1; i < blocksize; i++)
                    out[(size_t)i] = res[(size_t)(i - 1)]
                                     + out[(size_t)(i - 1)];
                break;
            case 2:
                for (int i = 2; i < blocksize; i++)
                    out[(size_t)i] = res[(size_t)(i - 2)]
                                     + 2 * out[(size_t)(i - 1)]
                                     - out[(size_t)(i - 2)];
                break;
            case 3:
                for (int i = 3; i < blocksize; i++)
                    out[(size_t)i] = res[(size_t)(i - 3)]
                                     + 3 * out[(size_t)(i - 1)]
                                     - 3 * out[(size_t)(i - 2)]
                                     + out[(size_t)(i - 3)];
                break;
            case 4:
                for (int i = 4; i < blocksize; i++)
                    out[(size_t)i] = res[(size_t)(i - 4)]
                                     + 4 * out[(size_t)(i - 1)]
                                     - 6 * out[(size_t)(i - 2)]
                                     + 4 * out[(size_t)(i - 3)]
                                     - out[(size_t)(i - 4)];
                break;
        }
    } else if (type & 0x20) {              /* LPC */
        int order = (int)(type & 0x1F) + 1;
        if (order > blocksize) return false;
        for (int i = 0; i < order; i++)
            out[(size_t)i] = br.read_signed(bps);
        uint32_t prec = (uint32_t)br.read_bits(4);
        if (prec == 0xF) return false;
        int precision = (int)prec + 1;
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;
        std::vector<int64_t> coef((size_t)order);
        for (int i = 0; i < order; i++)
            coef[(size_t)i] = br.read_signed(precision);
        std::vector<int64_t> res((size_t)blocksize);
        if (!read_residual(br, order, blocksize, res)) return false;
        for (int i = order; i < blocksize; i++) {
            int64_t acc = 0;
            for (int j = 0; j < order; j++)
                acc += coef[(size_t)j] * out[(size_t)(i - 1 - j)];
            out[(size_t)i] = res[(size_t)(i - order)] + (acc >> shift);
        }
    } else {
        return false;                      /* reserved type */
    }
    if (wasted)
        for (auto& v : out) v <<= wasted;
    return !br.overrun;
}

/* UTF-8-style coded number in frame headers (frame or sample index). */
bool read_utf8_num(BitReader& br, uint64_t* out) {
    uint32_t b0 = (uint32_t)br.read_bits(8);
    int extra;
    uint64_t v;
    if ((b0 & 0x80) == 0) { *out = b0; return true; }
    else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
    else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
    else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
    else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
    else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
    else if (b0 == 0xFE) { extra = 6; v = 0; }
    else return false;
    for (int i = 0; i < extra; i++) {
        uint32_t b = (uint32_t)br.read_bits(8);
        if ((b & 0xC0) != 0x80) return false;
        v = (v << 6) | (b & 0x3F);
    }
    *out = v;
    return !br.overrun;
}

const int kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                             256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleRates[16] = {0, 88200, 176400, 192000, 8000, 16000, 22050,
                              24000, 32000, 44100, 48000, 96000,
                              -1, -2, -3, 0};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

}  // namespace

extern "C" int64_t adc_decode_flac(const uint8_t* data, size_t size,
                                   float* out, int64_t out_capacity,
                                   int32_t* sample_rate_out) {
    if (size < 42 || memcmp(data, "fLaC", 4)) return -1;
    size_t pos = 4;
    int si_rate = 0, si_bps = 0;
    bool have_streaminfo = false;
    /* metadata blocks */
    for (;;) {
        if (pos + 4 > size) return -1;
        uint8_t hdr = data[pos];
        uint32_t len = ((uint32_t)data[pos + 1] << 16)
                       | ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
        pos += 4;
        if (pos + len > size) return -1;
        if ((hdr & 0x7F) == 0 && len >= 34) {  /* STREAMINFO */
            const uint8_t* b = data + pos;
            si_rate = ((int)b[10] << 12) | ((int)b[11] << 4)
                      | ((int)b[12] >> 4);
            si_bps = ((((int)b[12] & 1) << 4) | ((int)b[13] >> 4)) + 1;
            have_streaminfo = true;
        }
        pos += len;
        if (hdr & 0x80) break;  /* last-metadata-block flag */
    }
    if (!have_streaminfo || !si_rate) return -1;
    if (sample_rate_out) *sample_rate_out = si_rate;

    BitReader br(data, size);
    br.byte = pos;

    std::vector<std::vector<int64_t>> ch;
    int64_t written = 0;
    while (!br.eof() && written < out_capacity) {
        /* frame header */
        uint32_t sync = (uint32_t)br.read_bits(14);
        if (br.overrun) break;
        if (sync != 0x3FFE) break;  /* trailing garbage / end */
        br.read_bit();                      /* reserved */
        br.read_bit();                      /* blocking strategy */
        uint32_t bs_code = (uint32_t)br.read_bits(4);
        uint32_t sr_code = (uint32_t)br.read_bits(4);
        uint32_t ch_asgn = (uint32_t)br.read_bits(4);
        uint32_t ss_code = (uint32_t)br.read_bits(3);
        br.read_bit();                      /* reserved */
        uint64_t num;
        if (!read_utf8_num(br, &num)) return -1;

        int blocksize;
        if (bs_code == 6) blocksize = (int)br.read_bits(8) + 1;
        else if (bs_code == 7) blocksize = (int)br.read_bits(16) + 1;
        else if (bs_code == 0) return -1;
        else blocksize = kBlockSizes[bs_code];

        int rate = si_rate;
        if (sr_code == 12) rate = (int)br.read_bits(8) * 1000;
        else if (sr_code == 13) rate = (int)br.read_bits(16);
        else if (sr_code == 14) rate = (int)br.read_bits(16) * 10;
        else if (sr_code == 15) return -1;
        else if (sr_code != 0) rate = kSampleRates[sr_code];
        (void)rate;

        int bps = si_bps;
        if (ss_code != 0 && kSampleSizes[ss_code]) bps = kSampleSizes[ss_code];
        br.read_bits(8);                    /* CRC-8 (not validated) */

        if (ch_asgn > 10) return -1;  /* 11-15 reserved by the spec */
        int nch = ch_asgn < 8 ? (int)ch_asgn + 1 : 2;
        if (nch < 1 || nch > 8 || blocksize <= 0) return -1;
        ch.resize((size_t)nch);
        for (int c = 0; c < nch; c++) {
            int sub_bps = bps;
            /* the side channel carries one extra bit */
            if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
                (ch_asgn == 10 && c == 1))
                sub_bps += 1;
            if (!decode_subframe(br, blocksize, sub_bps, ch[(size_t)c]))
                return -1;
        }
        br.align();
        br.read_bits(16);                   /* CRC-16 (not validated) */
        if (br.overrun) return -1;

        /* stereo decorrelation */
        if (ch_asgn == 8) {                 /* left/side */
            for (int i = 0; i < blocksize; i++)
                ch[1][(size_t)i] = ch[0][(size_t)i] - ch[1][(size_t)i];
        } else if (ch_asgn == 9) {          /* right/side: ch0=side, ch1=right */
            for (int i = 0; i < blocksize; i++)
                ch[0][(size_t)i] = ch[1][(size_t)i] + ch[0][(size_t)i];
        } else if (ch_asgn == 10) {         /* mid/side */
            for (int i = 0; i < blocksize; i++) {
                int64_t side = ch[1][(size_t)i];
                int64_t mid = (ch[0][(size_t)i] << 1) | (side & 1);
                ch[0][(size_t)i] = (mid + side) >> 1;
                ch[1][(size_t)i] = (mid - side) >> 1;
            }
        }

        double scale = 1.0 / (double)(1ll << (bps - 1));
        int n = (int)std::min<int64_t>(blocksize, out_capacity - written);
        for (int i = 0; i < n; i++) {
            double acc = 0.0;
            for (int c = 0; c < nch; c++)
                acc += (double)ch[(size_t)c][(size_t)i];
            out[written + i] = (float)(acc / nch * scale);
        }
        written += n;
    }
    return written > 0 ? written : -1;
}

/* Sniff the container and dispatch. */
extern "C" int64_t adc_decode_audio(const uint8_t* data, size_t size,
                                    float* out, int64_t out_capacity,
                                    int32_t* sample_rate_out) {
    if (size >= 4 && !memcmp(data, "fLaC", 4))
        return adc_decode_flac(data, size, out, out_capacity,
                               sample_rate_out);
    return adc_decode_wav(data, size, out, out_capacity, sample_rate_out);
}
