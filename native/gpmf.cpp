// Native GPMF (GoPro Metadata Format) GPS extractor.
//
// Plays the performance role of the reference's gopro2gpx parseStream +
// BuildGPSPoints path (reference routeformer/io/dataset.py:2387-2468), which
// walks multi-megabyte telemetry streams in pure Python per recording at
// dataset-index time. This C++ walker mirrors the semantics of
// routeformer_tpu/io/gpmf.py's SCAL/GPSU/GPSF/GPSP/GPS5 finite-state machine
// (the Python implementation stays as the reference/fallback; parity is
// asserted in tests). Timestamp *fixing* (the 18 Hz plausibility logic)
// stays in Python — it is O(#points) cheap.
//
// Build:  g++ -O3 -shared -fPIC -o libgpmf.so gpmf.cpp
// ABI  :  extern "C" gpmf_extract_gps(...)  (ctypes)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <ctime>

namespace {

inline uint16_t be16(const uint8_t* p) {
    return static_cast<uint16_t>((p[0] << 8) | p[1]);
}

inline uint32_t be32(const uint8_t* p) {
    return (static_cast<uint32_t>(p[0]) << 24) | (static_cast<uint32_t>(p[1]) << 16) |
           (static_cast<uint32_t>(p[2]) << 8) | static_cast<uint32_t>(p[3]);
}

inline int32_t be32s(const uint8_t* p) { return static_cast<int32_t>(be32(p)); }

inline bool printable4(const uint8_t* p) {
    for (int i = 0; i < 4; ++i) {
        if (p[i] < 0x20 || p[i] > 0x7e) return false;
    }
    return true;
}

// Parse "yymmddhhmmss.sss" (GPMF 'U' type) to posix seconds (UTC), NaN on failure.
double parse_gpsu(const uint8_t* p, int len) {
    if (len < 12) return NAN;
    auto digit = [&](int i) -> int {
        if (p[i] < '0' || p[i] > '9') return -1;
        return p[i] - '0';
    };
    int vals[6];
    for (int f = 0; f < 6; ++f) {
        int a = digit(2 * f), b = digit(2 * f + 1);
        if (a < 0 || b < 0) return NAN;
        vals[f] = a * 10 + b;
    }
    double frac = 0.0;
    if (len >= 16 && p[12] == '.') {
        double scale = 0.1;
        for (int i = 13; i < len && p[i] >= '0' && p[i] <= '9'; ++i) {
            frac += (p[i] - '0') * scale;
            scale *= 0.1;
        }
    }
    struct tm t;
    std::memset(&t, 0, sizeof(t));
    t.tm_year = 100 + vals[0];  // 20yy
    t.tm_mon = vals[1] - 1;
    t.tm_mday = vals[2];
    t.tm_hour = vals[3];
    t.tm_min = vals[4];
    t.tm_sec = vals[5];
    time_t secs = timegm(&t);
    if (secs == static_cast<time_t>(-1)) return NAN;
    return static_cast<double>(secs) + frac;
}

struct State {
    double scal[5] = {1, 1, 1, 1, 1};
    int n_scal = 0;
    double gpsu = NAN;      // pending batch timestamp
    bool has_gpsu = false;
    double gpsp = NAN;      // dilution of precision
    int gpsfix = 0;
    // outputs
    double* out;            // (max_points, 5): lat, lon, alt, speed2d, dop
    double* out_time;       // (max_points,)
    long count = 0;
    long max_points = 0;
};

void walk(const uint8_t* data, long size, State& st) {
    long pos = 0;
    while (pos + 8 <= size) {
        const uint8_t* hdr = data + pos;
        if (!printable4(hdr)) {  // resync, matching the Python parser
            pos += 4;
            continue;
        }
        uint8_t type = hdr[4];
        uint8_t struct_size = hdr[5];
        uint16_t repeat = be16(hdr + 6);
        long length = static_cast<long>(struct_size) * repeat;
        long padded = (length + 3) & ~3L;
        if (pos + 8 + length > size) {
            pos += 4;
            continue;
        }
        const uint8_t* payload = data + pos + 8;
        uint32_t fourcc = be32(hdr);

        if (type == 0) {  // nested container
            walk(payload, length, st);
        } else if (fourcc == 0x5343414cu) {  // 'SCAL'
            int n = 0;
            if (type == 'l' || type == 'L') {
                for (long off = 0; off + 4 <= length && n < 5; off += 4)
                    st.scal[n++] = static_cast<double>(be32s(payload + off));
            } else if (type == 's' || type == 'S') {
                for (long off = 0; off + 2 <= length && n < 5; off += 2)
                    st.scal[n++] = static_cast<double>(
                        static_cast<int16_t>(be16(payload + off)));
            }
            if (n > 0) st.n_scal = n;
            for (int i = n; i < 5; ++i) st.scal[i] = st.scal[n > 0 ? n - 1 : 0];
        } else if (fourcc == 0x47505355u) {  // 'GPSU'
            st.gpsu = parse_gpsu(payload, static_cast<int>(length));
            st.has_gpsu = !std::isnan(st.gpsu);
        } else if (fourcc == 0x47505346u) {  // 'GPSF'
            if (length >= 4) st.gpsfix = static_cast<int>(be32(payload));
        } else if (fourcc == 0x47505350u) {  // 'GPSP'
            if (type == 'S' && length >= 2) st.gpsp = static_cast<double>(be16(payload));
            else if (length >= 4) st.gpsp = static_cast<double>(be32(payload));
        } else if (fourcc == 0x47505335u) {  // 'GPS5'
            int per_row = struct_size / 4;
            for (int r = 0; r < repeat; ++r) {
                const uint8_t* row = payload + static_cast<long>(r) * struct_size;
                if (per_row < 5) break;
                int32_t lat_r = be32s(row);
                int32_t lon_r = be32s(row + 4);
                int32_t alt_r = be32s(row + 8);
                int32_t s2d_r = be32s(row + 12);
                if (lat_r == 0 && lon_r == 0 && alt_r == 0) continue;  // empty fix
                if (st.count >= st.max_points) return;
                double* o = st.out + st.count * 5;
                o[0] = lat_r / st.scal[0];
                o[1] = lon_r / st.scal[1];
                o[2] = alt_r / st.scal[2];
                o[3] = s2d_r / st.scal[3];
                o[4] = (st.gpsfix == 0 || std::isnan(st.gpsp))
                           ? INFINITY
                           : st.gpsp;
                st.out_time[st.count] =
                    st.has_gpsu ? st.gpsu : NAN;  // GPSU stamps batch head only
                st.has_gpsu = false;
                ++st.count;
            }
        }
        pos += 8 + padded;
    }
}

}  // namespace

extern "C" {

// Returns the number of GPS points written (<= max_points).
// out:      caller-allocated (max_points * 5) doubles [lat, lon, alt, speed2d, dop]
// out_time: caller-allocated (max_points) doubles, posix seconds or NaN
long gpmf_extract_gps(const uint8_t* data, long size, double* out,
                      double* out_time, long max_points) {
    State st;
    st.out = out;
    st.out_time = out_time;
    st.max_points = max_points;
    walk(data, size, st);
    return st.count;
}

int gpmf_native_abi_version() { return 1; }

}  // extern "C"
