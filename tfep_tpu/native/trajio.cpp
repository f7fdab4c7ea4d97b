// Fast binary trajectory reading for the host-side data pipeline.
//
// DCD (CHARMM/NAMD/LAMMPS) reader: Fortran-unformatted records with a
// 'CORD' header, optional per-frame 6-double unit cell, and per-frame
// X/Y/Z float records. The reference framework reads trajectories through
// MDAnalysis (tfep/io/dataset/traj.py:43); here frame decoding is native
// so multi-gigabyte trajectories stream into the sharded batch pipeline
// without Python-loop overhead. Exposed through ctypes (no pybind11 in
// this environment); see tfep_tpu/io/dcd.py for the Python surface and a
// pure-Python fallback used when no compiler is available.
//
// Build: g++ -O3 -shared -fPIC -o _trajio.so trajio.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

struct DcdInfo {
    int64_t n_frames;
    int64_t n_atoms;
    int64_t has_cell;
    int64_t first_frame_offset;
    int64_t frame_size_bytes;
};

// Read a 4-byte record marker; returns -1 on EOF/error.
int64_t read_marker(std::FILE* f) {
    uint32_t marker;
    if (std::fread(&marker, 4, 1, f) != 1) return -1;
    return static_cast<int64_t>(marker);
}

bool parse_header(std::FILE* f, DcdInfo* info) {
    int64_t marker = read_marker(f);
    if (marker != 84) return false;

    char magic[4];
    if (std::fread(magic, 1, 4, f) != 4) return false;
    if (std::memcmp(magic, "CORD", 4) != 0) return false;

    int32_t icntrl[20];
    if (std::fread(icntrl, 4, 20, f) != 20) return false;
    if (read_marker(f) != 84) return false;

    int64_t n_frames_header = icntrl[0];
    info->has_cell = (icntrl[10] != 0) ? 1 : 0;

    // Title block: marker, ntitle, 80*ntitle chars, marker.
    int64_t title_marker = read_marker(f);
    if (title_marker < 4) return false;
    if (std::fseek(f, title_marker, SEEK_CUR) != 0) return false;
    if (read_marker(f) != title_marker) return false;

    // Atom-count record.
    if (read_marker(f) != 4) return false;
    int32_t n_atoms;
    if (std::fread(&n_atoms, 4, 1, f) != 1) return false;
    if (read_marker(f) != 4) return false;

    info->n_atoms = n_atoms;
    info->first_frame_offset = std::ftell(f);

    int64_t coord_record = 8 + 4 * static_cast<int64_t>(n_atoms);
    info->frame_size_bytes = 3 * coord_record
        + (info->has_cell ? (8 + 48) : 0);

    // Count frames from the file size (headers sometimes lie).
    std::fseek(f, 0, SEEK_END);
    int64_t file_size = std::ftell(f);
    int64_t data_bytes = file_size - info->first_frame_offset;
    info->n_frames = data_bytes / info->frame_size_bytes;
    if (n_frames_header > 0 && n_frames_header < info->n_frames)
        info->n_frames = n_frames_header;
    return true;
}

}  // namespace

extern "C" {

// Parse the DCD header. Returns 0 on success, negative on error.
// out = [n_frames, n_atoms, has_cell].
int dcd_read_header(const char* path, int64_t* out) {
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    DcdInfo info;
    bool ok = parse_header(f, &info);
    std::fclose(f);
    if (!ok) return -2;
    out[0] = info.n_frames;
    out[1] = info.n_atoms;
    out[2] = info.has_cell;
    return 0;
}

// Read `n_indices` frames (by frame index) into `positions`
// (n_indices * n_atoms * 3 floats, xyz interleaved per atom) and, when the
// file has a cell, `cells` (n_indices * 6 doubles). Returns 0 on success.
int dcd_read_frames(const char* path, const int64_t* frame_indices,
                    int64_t n_indices, float* positions, double* cells) {
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    DcdInfo info;
    if (!parse_header(f, &info)) {
        std::fclose(f);
        return -2;
    }

    const int64_t n_atoms = info.n_atoms;
    float* buffer = new float[n_atoms];

    for (int64_t i = 0; i < n_indices; ++i) {
        int64_t frame = frame_indices[i];
        if (frame < 0 || frame >= info.n_frames) {
            delete[] buffer;
            std::fclose(f);
            return -3;
        }
        int64_t offset = info.first_frame_offset
            + frame * info.frame_size_bytes;
        if (std::fseek(f, offset, SEEK_SET) != 0) {
            delete[] buffer;
            std::fclose(f);
            return -4;
        }

        if (info.has_cell) {
            double cell[6];
            if (read_marker(f) != 48
                || std::fread(cell, 8, 6, f) != 6
                || read_marker(f) != 48) {
                delete[] buffer;
                std::fclose(f);
                return -5;
            }
            if (cells) {
                // DCD cell order: A, gamma, B, beta, alpha, C ->
                // [lx, ly, lz, alpha, beta, gamma].
                cells[6 * i + 0] = cell[0];
                cells[6 * i + 1] = cell[2];
                cells[6 * i + 2] = cell[5];
                cells[6 * i + 3] = cell[4];
                cells[6 * i + 4] = cell[3];
                cells[6 * i + 5] = cell[1];
            }
        }

        float* frame_out = positions + i * n_atoms * 3;
        for (int dim = 0; dim < 3; ++dim) {
            int64_t expected = 4 * n_atoms;
            if (read_marker(f) != expected
                || std::fread(buffer, 4, n_atoms, f)
                   != static_cast<size_t>(n_atoms)
                || read_marker(f) != expected) {
                delete[] buffer;
                std::fclose(f);
                return -6;
            }
            for (int64_t a = 0; a < n_atoms; ++a) {
                frame_out[3 * a + dim] = buffer[a];
            }
        }
    }

    delete[] buffer;
    std::fclose(f);
    return 0;
}

}  // extern "C"
