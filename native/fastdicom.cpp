// Native DICOM slice reader — the C++ IO path of the CT ingest subsystem.
//
// The reference's image IO is C++ (ITK/GDCM, dicom_reader.cpp:15-129); this
// is the equivalent native component for the TPU build: a dependency-free
// parser for Part-10 DICOM files (implicit + explicit VR little endian)
// that extracts the geometry attributes and decodes + rescales the pixel
// data (slope * pixel + intercept + HU offset) straight into the caller's
// float32 volume slab. Exposed through a C ABI consumed via ctypes
// (dicom/native.py); dicom/ct.py falls back to the pure-Python parser when
// the shared library has not been built.
//
// Build: python setup.py build_ext  (or: make -C native)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Cursor {
    const uint8_t* buf;
    size_t len;
    size_t pos = 0;
    bool explicit_vr = true;

    bool ok(size_t n) const { return pos + n <= len; }
    uint16_t u16() { uint16_t v; std::memcpy(&v, buf + pos, 2); pos += 2; return v; }
    uint32_t u32() { uint32_t v; std::memcpy(&v, buf + pos, 4); pos += 4; return v; }
};

constexpr uint32_t kUndefined = 0xFFFFFFFFu;

bool is_long_vr(const char vr[2]) {
    static const char* kLong[] = {"OB", "OW", "OF", "OL", "OD", "SQ",
                                  "UC", "UR", "UT", "UN"};
    for (const char* v : kLong)
        if (vr[0] == v[0] && vr[1] == v[1]) return true;
    return false;
}

// Element header: returns false at end of data. Fills tag, value length and
// the value offset; sequences with undefined length are skipped recursively.
struct Element {
    uint32_t tag;         // (group << 16) | element
    size_t value_pos;
    uint32_t value_len;   // kUndefined for undefined-length SQ (skipped)
    char vr[3] = {0, 0, 0};
};

bool skip_undefined_sequence(Cursor& c);

bool next_element(Cursor& c, Element* e) {
    if (!c.ok(8)) return false;
    uint16_t group = c.u16();
    uint16_t elem = c.u16();
    e->tag = (uint32_t(group) << 16) | elem;
    if (group == 0xFFFE) {           // item / delimiter: 4-byte length
        e->value_len = c.u32();
        e->value_pos = c.pos;
        e->vr[0] = 0;
        return true;
    }
    uint32_t len;
    if (c.explicit_vr) {
        if (!c.ok(4)) return false;
        char vr[2] = {char(c.buf[c.pos]), char(c.buf[c.pos + 1])};
        c.pos += 2;
        e->vr[0] = vr[0]; e->vr[1] = vr[1];
        if (is_long_vr(vr)) {
            c.pos += 2;
            if (!c.ok(4)) return false;
            len = c.u32();
        } else {
            len = c.u16();
        }
    } else {
        if (!c.ok(4)) return false;
        len = c.u32();
        e->vr[0] = 0;
    }
    e->value_len = len;
    e->value_pos = c.pos;
    if (len == kUndefined) {
        // undefined-length sequence: walk items until the delimiter
        if (!skip_undefined_sequence(c)) return false;
        e->value_len = 0;            // treated as skipped
        return true;
    }
    if (!c.ok(len)) return false;
    c.pos += len;
    return true;
}

bool skip_undefined_sequence(Cursor& c) {
    while (c.ok(8)) {
        uint16_t group = c.u16();
        uint16_t elem = c.u16();
        uint32_t len = c.u32();
        if (group == 0xFFFE && elem == 0xE0DD) return true;   // seq delimiter
        if (group == 0xFFFE && elem == 0xE000) {              // item
            if (len == kUndefined) {
                // undefined-length item: recurse element-wise until item end
                while (c.ok(8)) {
                    uint16_t g2, e2;
                    std::memcpy(&g2, c.buf + c.pos, 2);
                    std::memcpy(&e2, c.buf + c.pos + 2, 2);
                    if (g2 == 0xFFFE && e2 == 0xE00D) { c.pos += 8; break; }
                    Element tmp;
                    if (!next_element(c, &tmp)) return false;
                }
            } else {
                if (!c.ok(len)) return false;
                c.pos += len;
            }
            continue;
        }
        return false;                                          // malformed
    }
    return false;
}

bool parse_floats(const uint8_t* p, uint32_t n, double* out, int max_vals,
                  int* n_out) {
    std::string s(reinterpret_cast<const char*>(p), n);
    int count = 0;
    size_t start = 0;
    while (start <= s.size() && count < max_vals) {
        size_t sep = s.find('\\', start);
        std::string tok = s.substr(start, sep == std::string::npos
                                   ? std::string::npos : sep - start);
        if (!tok.empty()) {
            out[count++] = std::strtod(tok.c_str(), nullptr);
        }
        if (sep == std::string::npos) break;
        start = sep + 1;
    }
    *n_out = count;
    return count > 0;
}

struct SliceMeta {
    double position[3];
    double orientation[6];
    double pixel_spacing[2];  // row, col
    double slope = 1.0, intercept = 0.0;
    int32_t rows = 0, cols = 0, bits = 16, is_signed = 1;
    int64_t pixel_pos = -1;
    uint32_t pixel_len = 0;
    int32_t is_ct = 0;
};

bool read_all(const char* path, std::vector<uint8_t>* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out->resize(size);
    size_t got = std::fread(out->data(), 1, size, f);
    std::fclose(f);
    return got == size_t(size);
}

bool parse_slice(const std::vector<uint8_t>& data, SliceMeta* m) {
    Cursor c{data.data(), data.size()};
    bool has_preamble = data.size() > 132 &&
                        std::memcmp(data.data() + 128, "DICM", 4) == 0;
    std::string ts = "1.2.840.10008.1.2.1";
    if (has_preamble) {
        c.pos = 132;
        c.explicit_vr = true;                     // meta group is explicit
        Element e;
        while (c.ok(8)) {
            uint16_t group;
            std::memcpy(&group, c.buf + c.pos, 2);
            if (group != 0x0002) break;
            if (!next_element(c, &e)) return false;
            if (e.tag == 0x00020010u) {
                ts.assign(reinterpret_cast<const char*>(data.data() + e.value_pos),
                          e.value_len);
                while (!ts.empty() && (ts.back() == '\0' || ts.back() == ' '))
                    ts.pop_back();
            }
        }
    } else {
        ts = "1.2.840.10008.1.2";
    }
    if (ts == "1.2.840.10008.1.2") c.explicit_vr = false;
    else if (ts == "1.2.840.10008.1.2.1") c.explicit_vr = true;
    else return false;                            // compressed: unsupported

    Element e;
    int nf;
    while (next_element(c, &e)) {
        const uint8_t* v = data.data() + e.value_pos;
        switch (e.tag) {
            case 0x00080060u:
                m->is_ct = (e.value_len >= 2 && v[0] == 'C' && v[1] == 'T');
                break;
            case 0x00200032u:
                parse_floats(v, e.value_len, m->position, 3, &nf);
                break;
            case 0x00200037u:
                parse_floats(v, e.value_len, m->orientation, 6, &nf);
                break;
            case 0x00280010u: m->rows = *reinterpret_cast<const uint16_t*>(v); break;
            case 0x00280011u: m->cols = *reinterpret_cast<const uint16_t*>(v); break;
            case 0x00280030u:
                parse_floats(v, e.value_len, m->pixel_spacing, 2, &nf);
                break;
            case 0x00280100u: m->bits = *reinterpret_cast<const uint16_t*>(v); break;
            case 0x00280103u: m->is_signed = *reinterpret_cast<const uint16_t*>(v); break;
            case 0x00281052u: parse_floats(v, e.value_len, &m->intercept, 1, &nf); break;
            case 0x00281053u: parse_floats(v, e.value_len, &m->slope, 1, &nf); break;
            case 0x7FE00010u:
                m->pixel_pos = int64_t(e.value_pos);
                m->pixel_len = e.value_len;
                break;
            default: break;
        }
    }
    return m->pixel_pos >= 0 && m->rows > 0 && m->cols > 0;
}

}  // namespace

extern "C" {

// Parse one slice's metadata. meta_out layout (doubles):
// [0..2] position, [3..8] orientation, [9..10] pixel spacing (row, col),
// [11] slope, [12] intercept, [13] rows, [14] cols, [15] is_ct.
// Returns 1 on success, 0 on parse failure / unsupported syntax.
int fastdicom_probe(const char* path, double* meta_out) {
    std::vector<uint8_t> data;
    if (!read_all(path, &data)) return 0;
    SliceMeta m;
    if (!parse_slice(data, &m)) return 0;
    std::memcpy(meta_out, m.position, 3 * sizeof(double));
    std::memcpy(meta_out + 3, m.orientation, 6 * sizeof(double));
    std::memcpy(meta_out + 9, m.pixel_spacing, 2 * sizeof(double));
    meta_out[11] = m.slope;
    meta_out[12] = m.intercept;
    meta_out[13] = m.rows;
    meta_out[14] = m.cols;
    meta_out[15] = m.is_ct;
    return 1;
}

// Decode + rescale one slice into dst (rows*cols float32):
// dst[i] = pixel[i] * slope + intercept + offset.
// Returns 1 on success.
int fastdicom_decode(const char* path, float* dst, int64_t capacity,
                     double offset) {
    std::vector<uint8_t> data;
    if (!read_all(path, &data)) return 0;
    SliceMeta m;
    if (!parse_slice(data, &m)) return 0;
    int64_t n = int64_t(m.rows) * m.cols;
    if (n > capacity || m.bits != 16) return 0;
    if (uint64_t(m.pixel_pos) + uint64_t(n) * 2 > data.size()) return 0;
    const float slope = float(m.slope);
    const float add = float(m.intercept + offset);
    if (m.is_signed) {
        const int16_t* src =
            reinterpret_cast<const int16_t*>(data.data() + m.pixel_pos);
        for (int64_t i = 0; i < n; ++i) dst[i] = float(src[i]) * slope + add;
    } else {
        const uint16_t* src =
            reinterpret_cast<const uint16_t*>(data.data() + m.pixel_pos);
        for (int64_t i = 0; i < n; ++i) dst[i] = float(src[i]) * slope + add;
    }
    return 1;
}

}  // extern "C"
