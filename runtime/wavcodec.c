/* Native WAV codec: the framework's L0 data-loader hot path.
 *
 * Decode + mono-mix + peak-normalize fused in one pass over the sample
 * buffer (the reference performs this chain in numpy for every script run —
 * SURVEY.md L0). Exposed to Python via the CPython C API (no pybind11 in
 * this image); audio_inpainting_tpu.io.wav uses it when built, with a pure
 * numpy fallback otherwise.
 *
 * Supports PCM int16/int32 and IEEE float32, mono or interleaved stereo+.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    uint16_t audio_format;
    uint16_t n_channels;
    uint32_t sample_rate;
    uint16_t bits;
    const unsigned char *data;
    size_t data_len;
} wav_info;

static int parse_wav(const unsigned char *buf, size_t len, wav_info *out,
                     const char **err) {
    if (len < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0) {
        *err = "not a RIFF/WAVE file";
        return -1;
    }
    size_t pos = 12;
    int have_fmt = 0, have_data = 0;
    while (pos + 8 <= len) {
        const unsigned char *chunk = buf + pos;
        uint32_t chunk_size;
        memcpy(&chunk_size, chunk + 4, 4);
        const unsigned char *body = chunk + 8;
        size_t body_len = chunk_size;
        if (pos + 8 + body_len > len) body_len = len - pos - 8;
        if (memcmp(chunk, "fmt ", 4) == 0 && body_len >= 16) {
            memcpy(&out->audio_format, body, 2);
            memcpy(&out->n_channels, body + 2, 2);
            memcpy(&out->sample_rate, body + 4, 4);
            memcpy(&out->bits, body + 14, 2);
            if (out->audio_format == 0xFFFE && body_len >= 26)
                memcpy(&out->audio_format, body + 24, 2); /* EXTENSIBLE */
            have_fmt = 1;
        } else if (memcmp(chunk, "data", 4) == 0) {
            out->data = body;
            out->data_len = body_len;
            have_data = 1;
        }
        pos += 8 + chunk_size + (chunk_size & 1);
    }
    if (!have_fmt || !have_data) {
        *err = "missing fmt/data chunk";
        return -1;
    }
    return 0;
}

/* load_mono_normalized(path) -> (sample_rate, bytes of float32 mono) */
static PyObject *load_mono_normalized(PyObject *self, PyObject *args) {
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) return NULL;

    FILE *f = fopen(path, "rb");
    if (!f) return PyErr_Format(PyExc_FileNotFoundError, "%s", path);
    fseek(f, 0, SEEK_END);
    long flen = ftell(f);
    fseek(f, 0, SEEK_SET);
    unsigned char *buf = (unsigned char *)malloc((size_t)flen);
    if (!buf) { fclose(f); return PyErr_NoMemory(); }
    if (fread(buf, 1, (size_t)flen, f) != (size_t)flen) {
        fclose(f); free(buf);
        return PyErr_Format(PyExc_IOError, "short read: %s", path);
    }
    fclose(f);

    wav_info w = {0}; const char *err = NULL;
    if (parse_wav(buf, (size_t)flen, &w, &err) != 0) {
        free(buf);
        return PyErr_Format(PyExc_ValueError, "%s: %s", path, err);
    }

    if (w.bits != 8 && w.bits != 16 && w.bits != 24 && w.bits != 32 &&
        w.bits != 64) {
        /* reject before bytes_per to avoid a divide-by-zero SIGFPE on
         * malformed fmt chunks declaring bits_per_sample < 8 */
        int bits = w.bits, format = w.audio_format;
        free(buf);
        return PyErr_Format(PyExc_ValueError,
                            "%s: unsupported format %d/%d-bit", path,
                            format, bits);
    }
    size_t bytes_per = w.bits / 8;
    size_t n_total = w.data_len / bytes_per;
    size_t n_frames = w.n_channels ? n_total / w.n_channels : 0;
    if (n_frames == 0) {
        free(buf);
        return PyErr_Format(PyExc_ValueError, "%s: empty data", path);
    }

    float *mono = (float *)malloc(n_frames * sizeof(float));
    if (!mono) { free(buf); return PyErr_NoMemory(); }

    const unsigned char *d = w.data;
    int ch = w.n_channels;
    Py_BEGIN_ALLOW_THREADS
    if (w.audio_format == 1 && w.bits == 8) {
        /* uint8 PCM: raw 0..255 values, matching the numpy fallback
         * (io/wav.py reads uint8 as-is; the peak-normalize below then
         * mirrors peak_normalize(to_float_mono(...)) exactly) */
        const uint8_t *s = (const uint8_t *)d;
        for (size_t i = 0; i < n_frames; i++) {
            double acc = 0.0;
            for (int c = 0; c < ch; c++) acc += s[i * ch + c];
            mono[i] = (float)(acc / ch);
        }
    } else if (w.audio_format == 1 && w.bits == 16) {
        const int16_t *s = (const int16_t *)d;
        for (size_t i = 0; i < n_frames; i++) {
            double acc = 0.0;
            for (int c = 0; c < ch; c++) acc += s[i * ch + c];
            mono[i] = (float)(acc / ch);
        }
    } else if (w.audio_format == 1 && w.bits == 24) {
        /* 24-bit PCM: assemble little-endian triples into int32 << 8 (the
         * scipy/io-wav.py convention: sample in the HIGH three bytes), so
         * this path is bit-identical to the numpy fallback after the
         * normalize below. */
        for (size_t i = 0; i < n_frames; i++) {
            double acc = 0.0;
            for (int c = 0; c < ch; c++) {
                const unsigned char *p = d + 3 * (i * ch + c);
                int32_t v = (int32_t)((uint32_t)p[0] << 8 |
                                      (uint32_t)p[1] << 16 |
                                      (uint32_t)p[2] << 24);
                acc += v;
            }
            mono[i] = (float)(acc / ch);
        }
    } else if (w.audio_format == 1 && w.bits == 32) {
        const int32_t *s = (const int32_t *)d;
        for (size_t i = 0; i < n_frames; i++) {
            double acc = 0.0;
            for (int c = 0; c < ch; c++) acc += s[i * ch + c];
            mono[i] = (float)(acc / ch);
        }
    } else if (w.audio_format == 3 && w.bits == 32) {
        const float *s = (const float *)d;
        for (size_t i = 0; i < n_frames; i++) {
            double acc = 0.0;
            for (int c = 0; c < ch; c++) acc += s[i * ch + c];
            mono[i] = (float)(acc / ch);
        }
    } else if (w.audio_format == 3 && w.bits == 64) {
        /* IEEE float64: the numpy fallback reads these (io/wav.py), so the
         * native path must too — both-paths format parity (PARITY.md) */
        const double *s = (const double *)d;
        for (size_t i = 0; i < n_frames; i++) {
            double acc = 0.0;
            for (int c = 0; c < ch; c++) acc += s[i * ch + c];
            mono[i] = (float)(acc / ch);
        }
    } else {
        n_frames = 0; /* unsupported; signal after releasing GIL */
    }
    Py_END_ALLOW_THREADS
    if (n_frames == 0) {
        free(buf); free(mono);
        return PyErr_Format(PyExc_ValueError,
                            "%s: unsupported format %d/%d-bit", path,
                            w.audio_format, w.bits);
    }

    /* peak normalize (no-op for all-zero input), reference convention */
    float peak = 0.0f;
    for (size_t i = 0; i < n_frames; i++) {
        float a = mono[i] < 0 ? -mono[i] : mono[i];
        if (a > peak) peak = a;
    }
    if (peak > 0.0f) {
        float inv = 1.0f / peak;
        for (size_t i = 0; i < n_frames; i++) mono[i] *= inv;
    }

    PyObject *bytes = PyBytes_FromStringAndSize((const char *)mono,
                                                (Py_ssize_t)(n_frames * 4));
    free(buf);
    free(mono);
    if (!bytes) return NULL;
    PyObject *ret = Py_BuildValue("(IN)", w.sample_rate, bytes);
    return ret;
}

/* write_int16(path, sample_rate, float32_bytes, clip) -> None
 * Fused clip -> x32767 -> int16 quantize -> RIFF write. */
static PyObject *write_int16(PyObject *self, PyObject *args) {
    const char *path;
    unsigned int sr;
    Py_buffer view;
    float clip;
    if (!PyArg_ParseTuple(args, "sIy*f", &path, &sr, &view, &clip)) return NULL;
    size_t n = (size_t)view.len / 4;
    const float *x = (const float *)view.buf;

    int16_t *q = (int16_t *)malloc(n * 2);
    if (!q) { PyBuffer_Release(&view); return PyErr_NoMemory(); }
    Py_BEGIN_ALLOW_THREADS
    for (size_t i = 0; i < n; i++) {
        float v = x[i];
        if (v > clip) v = clip;
        if (v < -clip) v = -clip;
        q[i] = (int16_t)(v * 32767.0f);
    }
    Py_END_ALLOW_THREADS

    FILE *f = fopen(path, "wb");
    if (!f) {
        free(q); PyBuffer_Release(&view);
        return PyErr_Format(PyExc_IOError, "cannot open %s", path);
    }
    uint32_t data_len = (uint32_t)(n * 2);
    uint32_t riff_len = 36 + data_len;
    uint32_t byte_rate = sr * 2;
    uint16_t block_align = 2, bits = 16, fmt = 1, ch = 1;
    uint32_t fmt_len = 16;
    fwrite("RIFF", 1, 4, f); fwrite(&riff_len, 4, 1, f);
    fwrite("WAVE", 1, 4, f);
    fwrite("fmt ", 1, 4, f); fwrite(&fmt_len, 4, 1, f);
    fwrite(&fmt, 2, 1, f); fwrite(&ch, 2, 1, f);
    fwrite(&sr, 4, 1, f); fwrite(&byte_rate, 4, 1, f);
    fwrite(&block_align, 2, 1, f); fwrite(&bits, 2, 1, f);
    fwrite("data", 1, 4, f); fwrite(&data_len, 4, 1, f);
    fwrite(q, 2, n, f);
    if (data_len & 1) fputc(0, f);
    fclose(f);
    free(q);
    PyBuffer_Release(&view);
    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"load_mono_normalized", load_mono_normalized, METH_VARARGS,
     "load_mono_normalized(path) -> (sr, float32 mono bytes), peak-normalized"},
    {"write_int16", write_int16, METH_VARARGS,
     "write_int16(path, sr, float32_bytes, clip): clipped int16 WAV write"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef module = {PyModuleDef_HEAD_INIT, "_wavcodec",
                                    "native WAV codec", -1, methods};

PyMODINIT_FUNC PyInit__wavcodec(void) { return PyModule_Create(&module); }
