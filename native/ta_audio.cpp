// ta_audio: native host-side audio runtime for tiny_audio_tpu.
//
// The TPU compute path is JAX/XLA; the host data path (wav decode, resample,
// augmentation DSP, VAD features) feeds it from dataloader workers and the
// serving front door.  The reference framework leans on ffmpeg/torchaudio/
// audiomentations C extensions for this work (SURVEY.md §2); here the same
// role is played by this self-contained C++ library, bound via ctypes
// (tiny_audio_tpu/native.py) with numpy fallbacks kept as the test oracle.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC ta_audio.cpp -o libta_audio.so
//
// API convention: all functions return >= 0 on success, < 0 on error.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <complex>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------- WAV decode

// Parse RIFF/WAVE headers. Returns 0 on success and fills (frames, rate,
// channels, bits, data_offset). Handles PCM (1) and IEEE float (3) formats
// and skips non-data chunks (LIST, fact, ...).
static int wav_parse(const uint8_t* bytes, int64_t n, int64_t* frames,
                     int32_t* rate, int32_t* channels, int32_t* bits,
                     int32_t* fmt_code, int64_t* data_offset,
                     int64_t* data_size) {
    if (n < 44 || std::memcmp(bytes, "RIFF", 4) || std::memcmp(bytes + 8, "WAVE", 4))
        return -1;
    int64_t pos = 12;
    bool have_fmt = false, have_data = false;
    while (pos + 8 <= n) {
        const uint8_t* chunk = bytes + pos;
        uint32_t size;
        std::memcpy(&size, chunk + 4, 4);
        const uint8_t* body = chunk + 8;
        if (!std::memcmp(chunk, "fmt ", 4) && size >= 16 && pos + 8 + size <= n) {
            uint16_t code, ch, bps;
            uint32_t sr;
            std::memcpy(&code, body, 2);
            std::memcpy(&ch, body + 2, 2);
            std::memcpy(&sr, body + 4, 4);
            std::memcpy(&bps, body + 14, 2);
            *fmt_code = code;
            *channels = ch;
            *rate = (int32_t)sr;
            *bits = bps;
            have_fmt = true;
        } else if (!std::memcmp(chunk, "data", 4)) {
            *data_offset = pos + 8;
            *data_size = std::min<int64_t>((int64_t)size, n - (pos + 8));
            have_data = true;
        }
        pos += 8 + size + (size & 1);  // chunks are word-aligned
        if (have_fmt && have_data) break;
    }
    // bits < 8 (e.g. 4-bit IMA-ADPCM) would make the bytes-per-frame term
    // zero — integer division by zero is a SIGFPE process kill, not an
    // exception, so reject here and let the caller's stdlib path handle it
    if (!have_fmt || !have_data || *channels <= 0 || *bits < 8) return -2;
    *frames = *data_size / ((*bits / 8) * *channels);
    return 0;
}

// Query decoded length/rate without decoding.
int ta_wav_info(const uint8_t* bytes, int64_t n, int64_t* frames,
                int32_t* rate) {
    int32_t channels, bits, fmt;
    int64_t off, size;
    return wav_parse(bytes, n, frames, rate, &channels, &bits, &fmt, &off, &size);
}

// Decode to float32 mono in [-1, 1] (channel-averaged).  out must hold
// `frames` floats (from ta_wav_info).  Returns frames written.
int64_t ta_wav_decode(const uint8_t* bytes, int64_t n, float* out) {
    int64_t frames, off, size;
    int32_t rate, channels, bits, fmt;
    if (wav_parse(bytes, n, &frames, &rate, &channels, &bits, &fmt, &off, &size))
        return -1;
    // Only plain PCM (1) and IEEE float (3) are supported; anything else
    // (A-law/mu-law 6/7, WAVE_FORMAT_EXTENSIBLE 0xFFFE, ...) must fall back
    // to the caller's stdlib path rather than be mis-decoded as PCM.
    if (fmt != 1 && fmt != 3) return -3;
    if (fmt == 3 && bits != 32) return -3;
    const uint8_t* d = bytes + off;
    const double inv_ch = 1.0 / channels;
    for (int64_t i = 0; i < frames; i++) {
        double acc = 0.0;
        for (int32_t c = 0; c < channels; c++) {
            int64_t idx = i * channels + c;
            if (fmt == 3 && bits == 32) {           // IEEE float
                float v;
                std::memcpy(&v, d + 4 * idx, 4);
                acc += v;
            } else if (bits == 16) {
                int16_t v;
                std::memcpy(&v, d + 2 * idx, 2);
                acc += v / 32768.0;
            } else if (bits == 32) {
                int32_t v;
                std::memcpy(&v, d + 4 * idx, 4);
                acc += v / 2147483648.0;
            } else if (bits == 8) {
                acc += (d[idx] - 128.0) / 128.0;
            } else {
                return -2;
            }
        }
        out[i] = (float)(acc * inv_ch);
    }
    return frames;
}

// ------------------------------------------------------------------ resample

// Windowed-sinc (Kaiser-free, Hann-windowed, 16 taps/side) arbitrary-ratio
// resampler — higher quality than linear, no FFT length constraints.
// out must hold ceil(n * target / orig) floats. Returns output length.
int64_t ta_resample(const float* in, int64_t n, int32_t orig_rate,
                    int32_t target_rate, float* out) {
    if (n == 0) return 0;
    if (orig_rate == target_rate) {
        std::memcpy(out, in, sizeof(float) * n);
        return n;
    }
    const double ratio = (double)target_rate / orig_rate;
    // EXACT integer ceil — the float form ceil(n * (target/orig)) can round
    // one above the Python wrapper's allocation (n=147 at 44100->24000:
    // 81 vs 80), writing past the numpy buffer.  native.py uses the same
    // integer formula.
    const int64_t out_len =
        ((int64_t)n * target_rate + orig_rate - 1) / orig_rate;
    const int TAPS = 16;
    // low-pass cutoff at the smaller Nyquist
    const double cutoff = std::min(1.0, ratio) * 0.95;
    for (int64_t j = 0; j < out_len; j++) {
        const double t = j / ratio;  // position in input samples
        const int64_t center = (int64_t)std::floor(t);
        double acc = 0.0, wsum = 0.0;
        for (int64_t k = center - TAPS + 1; k <= center + TAPS; k++) {
            const double x = t - k;
            const double sinc = (x == 0.0)
                ? cutoff
                : std::sin(M_PI * cutoff * x) / (M_PI * x);
            const double w = 0.5 + 0.5 * std::cos(M_PI * x / TAPS);  // Hann
            const double coeff = sinc * (std::fabs(x) <= TAPS ? w : 0.0);
            const int64_t idx = std::clamp<int64_t>(k, 0, n - 1);
            acc += coeff * in[idx];
            wsum += coeff;
        }
        out[j] = (float)(wsum != 0.0 ? acc / wsum : 0.0);
    }
    return out_len;
}

// ----------------------------------------------------------------------- FFT

// Iterative radix-2 complex FFT (in-place). n must be a power of two.
static void fft_inplace(std::complex<double>* a, int64_t n, bool inverse) {
    for (int64_t i = 1, j = 0; i < n; i++) {
        int64_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) std::swap(a[i], a[j]);
    }
    for (int64_t len = 2; len <= n; len <<= 1) {
        const double ang = 2.0 * M_PI / len * (inverse ? 1 : -1);
        const std::complex<double> wl(std::cos(ang), std::sin(ang));
        for (int64_t i = 0; i < n; i += len) {
            std::complex<double> w(1.0);
            for (int64_t k = 0; k < len / 2; k++) {
                auto u = a[i + k], v = a[i + k + len / 2] * w;
                a[i + k] = u + v;
                a[i + k + len / 2] = u - v;
                w *= wl;
            }
        }
    }
    if (inverse)
        for (int64_t i = 0; i < n; i++) a[i] /= (double)n;
}

// FFT convolution, output truncated to na samples (the augmentation RIR
// contract: same-length wet signal).
int64_t ta_fft_convolve(const float* a, int64_t na, const float* k, int64_t nk,
                        float* out) {
    int64_t need = na + nk - 1, nfft = 1;
    while (nfft < need) nfft <<= 1;
    std::vector<std::complex<double>> fa(nfft), fk(nfft);
    for (int64_t i = 0; i < na; i++) fa[i] = a[i];
    for (int64_t i = 0; i < nk; i++) fk[i] = k[i];
    fft_inplace(fa.data(), nfft, false);
    fft_inplace(fk.data(), nfft, false);
    for (int64_t i = 0; i < nfft; i++) fa[i] *= fk[i];
    fft_inplace(fa.data(), nfft, true);
    for (int64_t i = 0; i < na; i++) out[i] = (float)fa[i].real();
    return na;
}

// ---------------------------------------------------------------- SNR mixing

// audio += gain * noise, gain chosen for the requested SNR (dB). noise is
// tiled if shorter than audio.  Matches augmentation._mix_at_snr.
int ta_mix_snr(float* audio, int64_t n, const float* noise, int64_t nn,
               float snr_db) {
    if (n == 0 || nn == 0) return 0;
    double se = 0.0, ne = 0.0;
    for (int64_t i = 0; i < n; i++) se += (double)audio[i] * audio[i];
    for (int64_t i = 0; i < n; i++) {
        const float v = noise[i % nn];
        ne += (double)v * v;
    }
    const double sig_rms = std::sqrt(se / n + 1e-12);
    const double noise_rms = std::sqrt(ne / n + 1e-12);
    if (noise_rms <= 0.0) return 0;
    const double gain = sig_rms / noise_rms / std::pow(10.0, snr_db / 20.0);
    for (int64_t i = 0; i < n; i++)
        audio[i] += (float)(gain * noise[i % nn]);
    return 0;
}

// ----------------------------------------------------------- VAD frame feats

// Per-frame log-energy (dB) and spectral flatness over Hann-windowed hops —
// the feature extraction inside diarization.frame_vad, vectorized in C++.
// energy_db/flatness must hold n/hop floats. Returns the frame count.
int64_t ta_vad_features(const float* audio, int64_t n, int32_t hop,
                        float* energy_db, float* flatness) {
    const int64_t frames = n / hop;
    if (frames <= 0) return 0;
    int64_t nfft = 1;
    while (nfft < hop) nfft <<= 1;
    std::vector<double> window(hop);
    for (int32_t i = 0; i < hop; i++)
        window[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (hop - 1));  // hanning
    std::vector<std::complex<double>> buf(nfft);
    const int64_t nbins = nfft / 2 + 1;
    for (int64_t f = 0; f < frames; f++) {
        const float* x = audio + f * hop;
        double e = 0.0;
        for (int32_t i = 0; i < hop; i++) e += (double)x[i] * x[i];
        energy_db[f] = (float)(10.0 * std::log10(e / hop + 1e-10));

        for (int64_t i = 0; i < nfft; i++)
            buf[i] = (i < hop) ? std::complex<double>(x[i] * window[i]) : 0.0;
        fft_inplace(buf.data(), nfft, false);
        double logsum = 0.0, linsum = 0.0;
        for (int64_t i = 0; i < nbins; i++) {
            const double mag = std::abs(buf[i]) + 1e-10;
            const double p = mag * mag;
            logsum += std::log(p);
            linsum += p;
        }
        flatness[f] = (float)(std::exp(logsum / nbins) / (linsum / nbins));
    }
    return frames;
}

}  // extern "C"
