// Native PNG codec for myrenderer_tpu's asset/golden IO.
//
// The reference loads its heightmap with zigimg's PNG decoder
// (/root/reference/Terrain/Terrain.zig:89-93 via zigimg); this is the
// rebuild's native equivalent: a from-scratch PNG chunk walker +
// filter reconstruction over zlib inflate/deflate. Scope matches the
// framework's actual traffic: decode grayscale 8/16-bit (color type
// 0) and RGBA 8-bit (color type 6), encode grayscale 16-bit and RGBA
// 8-bit, no interlace, no palette. utils/png.py dispatches here when
// the library is built and falls back to PIL otherwise; both paths
// must produce identical pixels (tests/test_native.py).

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

constexpr uint8_t SIG[8] = {137, 80, 78, 71, 13, 10, 26, 10};

uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(uint8_t(x >> 24));
    v.push_back(uint8_t(x >> 16));
    v.push_back(uint8_t(x >> 8));
    v.push_back(uint8_t(x));
}

struct Header {
    int w = 0, h = 0, bitdepth = 0, color = 0, interlace = 0;
};

// -1 bad signature/structure, -2 unsupported format
int parse_header(const uint8_t* buf, long n, Header* hd) {
    if (n < 33 || std::memcmp(buf, SIG, 8) != 0) return -1;
    const uint8_t* p = buf + 8;
    if (be32(p) != 13 || std::memcmp(p + 4, "IHDR", 4) != 0) return -1;
    hd->w = int(be32(p + 8));
    hd->h = int(be32(p + 12));
    hd->bitdepth = p[16];
    hd->color = p[17];
    hd->interlace = p[20];
    if (hd->w <= 0 || hd->h <= 0) return -1;
    if (hd->interlace != 0) return -2;
    if (hd->color == 0) {
        if (hd->bitdepth != 8 && hd->bitdepth != 16) return -2;
    } else if (hd->color == 6) {
        if (hd->bitdepth != 8) return -2;
    } else {
        return -2;
    }
    return 0;
}

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return a;
    return pb <= pc ? b : c;
}

// inflate all IDAT payloads; 0 ok
int inflate_idat(const uint8_t* buf, long n, std::vector<uint8_t>& raw) {
    z_stream zs{};
    if (inflateInit(&zs) != Z_OK) return -3;
    const uint8_t* p = buf + 8;
    const uint8_t* endp = buf + n;
    int ret = 0;
    bool done = false;
    while (p + 12 <= endp && !done) {
        uint32_t len = be32(p);
        if (p + 12 + len > endp) { ret = -1; break; }
        if (std::memcmp(p + 4, "IDAT", 4) == 0) {
            zs.next_in = const_cast<uint8_t*>(p + 8);
            zs.avail_in = len;
            while (zs.avail_in) {
                size_t off = raw.size();
                raw.resize(off + 65536);
                zs.next_out = raw.data() + off;
                zs.avail_out = 65536;
                int zr = inflate(&zs, Z_NO_FLUSH);
                raw.resize(off + (65536 - zs.avail_out));
                if (zr == Z_STREAM_END) { done = true; break; }
                if (zr != Z_OK) { ret = -3; break; }
            }
            if (ret) break;
        } else if (std::memcmp(p + 4, "IEND", 4) == 0) {
            break;
        }
        p += 12 + len;
    }
    inflateEnd(&zs);
    return ret;
}

// per-row filter reconstruction, in place over raw scanlines
int unfilter(std::vector<uint8_t>& raw, int h, long rowbytes, int bpp,
             std::vector<uint8_t>& px) {
    if ((long)raw.size() < h * (rowbytes + 1)) return -1;
    px.resize(h * rowbytes);
    for (int y = 0; y < h; y++) {
        const uint8_t* src = raw.data() + y * (rowbytes + 1);
        uint8_t ft = src[0];
        src++;
        uint8_t* cur = px.data() + y * rowbytes;
        const uint8_t* up = y ? px.data() + (y - 1) * rowbytes : nullptr;
        for (long x = 0; x < rowbytes; x++) {
            int a = x >= bpp ? cur[x - bpp] : 0;
            int b = up ? up[x] : 0;
            int c = (up && x >= bpp) ? up[x - bpp] : 0;
            int v = src[x];
            switch (ft) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: return -1;
            }
            cur[x] = uint8_t(v);
        }
    }
    return 0;
}

void chunk(std::vector<uint8_t>& out, const char* tag,
           const uint8_t* data, size_t n) {
    put_be32(out, uint32_t(n));
    size_t tag_at = out.size();
    out.insert(out.end(), tag, tag + 4);
    out.insert(out.end(), data, data + n);
    uint32_t crc = crc32(0, out.data() + tag_at, uInt(4 + n));
    put_be32(out, crc);
}

long encode(const uint8_t* pixels, int w, int h, int bpp, int bitdepth,
            int color, uint8_t* out, long cap) {
    long rowbytes = (long)w * bpp;
    std::vector<uint8_t> filt(h * (rowbytes + 1));
    for (int y = 0; y < h; y++) {
        filt[y * (rowbytes + 1)] = 0;   // filter None
        std::memcpy(filt.data() + y * (rowbytes + 1) + 1,
                    pixels + y * rowbytes, rowbytes);
    }
    uLongf zcap = compressBound(uLong(filt.size()));
    std::vector<uint8_t> z(zcap);
    if (compress2(z.data(), &zcap, filt.data(), uLong(filt.size()), 6)
            != Z_OK)
        return 0;
    z.resize(zcap);

    std::vector<uint8_t> png(SIG, SIG + 8);
    uint8_t ihdr[13];
    ihdr[0] = uint8_t(uint32_t(w) >> 24); ihdr[1] = uint8_t(w >> 16);
    ihdr[2] = uint8_t(w >> 8); ihdr[3] = uint8_t(w);
    ihdr[4] = uint8_t(uint32_t(h) >> 24); ihdr[5] = uint8_t(h >> 16);
    ihdr[6] = uint8_t(h >> 8); ihdr[7] = uint8_t(h);
    ihdr[8] = uint8_t(bitdepth);
    ihdr[9] = uint8_t(color);
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    chunk(png, "IHDR", ihdr, 13);
    chunk(png, "IDAT", z.data(), z.size());
    chunk(png, "IEND", nullptr, 0);

    if ((long)png.size() > cap) return -(long)png.size();
    std::memcpy(out, png.data(), png.size());
    return (long)png.size();
}

}  // namespace

extern "C" {

// 0 ok, -1 malformed, -2 unsupported format (caller falls back to PIL)
int myr_png_dims(const uint8_t* buf, long n, int* w, int* h,
                 int* bitdepth, int* color) {
    Header hd;
    int r = parse_header(buf, n, &hd);
    if (r) return r;
    *w = hd.w; *h = hd.h; *bitdepth = hd.bitdepth; *color = hd.color;
    return 0;
}

// grayscale (color 0) -> uint16 [h*w]; 8-bit widens v*257 (the
// convention utils/png.py documents). 0 ok.
int myr_png_decode_gray16(const uint8_t* buf, long n, uint16_t* out) {
    Header hd;
    int r = parse_header(buf, n, &hd);
    if (r) return r;
    if (hd.color != 0) return -2;
    int bpp = hd.bitdepth / 8;
    long rowbytes = (long)hd.w * bpp;
    std::vector<uint8_t> raw, px;
    if ((r = inflate_idat(buf, n, raw))) return r;
    if ((r = unfilter(raw, hd.h, rowbytes, bpp, px))) return r;
    for (long i = 0; i < (long)hd.w * hd.h; i++)
        out[i] = hd.bitdepth == 16
            ? uint16_t((px[2 * i] << 8) | px[2 * i + 1])   // big-endian
            : uint16_t(px[i] * 257);
    return 0;
}

// RGBA 8-bit (color 6) -> uint8 [h*w*4]. 0 ok.
int myr_png_decode_rgba8(const uint8_t* buf, long n, uint8_t* out) {
    Header hd;
    int r = parse_header(buf, n, &hd);
    if (r) return r;
    if (hd.color != 6) return -2;
    long rowbytes = (long)hd.w * 4;
    std::vector<uint8_t> raw, px;
    if ((r = inflate_idat(buf, n, raw))) return r;
    if ((r = unfilter(raw, hd.h, rowbytes, 4, px))) return r;
    std::memcpy(out, px.data(), (size_t)hd.h * rowbytes);
    return 0;
}

// encoders return the PNG byte count, -needed when cap is too small,
// 0 on internal error
long myr_png_encode_rgba8(const uint8_t* rgba, int w, int h,
                          uint8_t* out, long cap) {
    return encode(rgba, w, h, 4, 8, 6, out, cap);
}

long myr_png_encode_gray16(const uint16_t* gray, int w, int h,
                           uint8_t* out, long cap) {
    std::vector<uint8_t> be((size_t)w * h * 2);
    for (long i = 0; i < (long)w * h; i++) {
        be[2 * i] = uint8_t(gray[i] >> 8);
        be[2 * i + 1] = uint8_t(gray[i]);
    }
    return encode(be.data(), w, h, 2, 16, 0, out, cap);
}

}  // extern "C"
