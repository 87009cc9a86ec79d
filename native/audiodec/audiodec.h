/* audiodec: native audio decode + resample + prefetch for the host data
 * pipeline.
 *
 * The reference framework's data loading relies on torch's C++ DataLoader
 * workers and torchaudio's C++ DSP (reference: urban_sounds/dataset.py:98,
 * :37-39). This library is the TPU framework's first-party equivalent:
 * PCM wav parsing, polyphase windowed-sinc resampling, fixed-length
 * padding/peak-normalization, and a multi-threaded prefetch pool that
 * keeps the host pipeline ahead of the TPU step. Exposed to Python via
 * ctypes (audio_transformers_tpu/data/native_loader.py).
 */

#ifndef AUDIODEC_H
#define AUDIODEC_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- decoding ---------------------------------------------------------- */

/* Parse a PCM wav buffer. Returns number of output samples (mono-mixed),
 * or -1 on error. *sample_rate_out receives the file's rate. The caller
 * provides `out` with capacity `out_capacity` floats; if the decoded length
 * exceeds it, the audio is truncated. */
int64_t adc_decode_wav(const uint8_t* data, size_t size, float* out,
                       int64_t out_capacity, int32_t* sample_rate_out);

/* First-party FLAC decoder (flac.cpp): CONSTANT/VERBATIM/FIXED/LPC
 * subframes, Rice residuals, stereo decorrelation, 8-32 bit. Same
 * contract as adc_decode_wav (mono mixdown). The reference gets flac via
 * librosa/libsndfile (whisper_finetune/streamlit_app.py:64-68). */
int64_t adc_decode_flac(const uint8_t* data, size_t size, float* out,
                        int64_t out_capacity, int32_t* sample_rate_out);

/* Sniff the container magic (RIFF / fLaC) and dispatch. */
int64_t adc_decode_audio(const uint8_t* data, size_t size, float* out,
                         int64_t out_capacity, int32_t* sample_rate_out);

/* ---- resampling -------------------------------------------------------- */

/* Polyphase windowed-sinc resampler (Kaiser window), capability-equivalent
 * to torchaudio.transforms.Resample. Returns output length or -1. */
int64_t adc_resample(const float* in, int64_t in_len, int32_t in_rate,
                     int32_t out_rate, float* out, int64_t out_capacity);

/* Expected output length for a resample call. */
int64_t adc_resample_out_len(int64_t in_len, int32_t in_rate,
                             int32_t out_rate);

/* ---- clip preprocessing ------------------------------------------------ */

/* mono in -> pad/trim to target_len, optional peak normalization.
 * (reference: urban_sounds/dataset.py:42-52) */
void adc_pad_normalize(const float* in, int64_t in_len, float* out,
                       int64_t target_len, int normalize);

/* ---- prefetch pool ------------------------------------------------------ */

/* Opaque pool decoding wav FILES into fixed-length clips on worker
 * threads. Results are delivered in submission order. */
typedef struct adc_pool adc_pool;

adc_pool* adc_pool_create(int num_threads, int32_t target_rate,
                          int64_t target_len, int normalize, int capacity);
/* Submit a wav file path with a user tag. Returns 0, or -1 if full. */
int adc_pool_submit(adc_pool* pool, const char* path, int64_t tag);
/* Pop the next completed clip (blocking). Writes target_len floats into
 * `out`, the tag into *tag_out. Returns 0 on success, -1 on decode error
 * (tag still delivered), -2 if the pool is draining and empty. */
int adc_pool_pop(adc_pool* pool, float* out, int64_t* tag_out);
/* Number of items submitted but not yet popped. */
int adc_pool_pending(adc_pool* pool);
void adc_pool_destroy(adc_pool* pool);

#ifdef __cplusplus
}
#endif

#endif /* AUDIODEC_H */
