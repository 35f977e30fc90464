// Standalone lens-distortion ST-map CLI.
//
// Native counterpart of the reference's tools/lensdistortion binary
// (ref: tools/lensdistortion/src/main.cpp): compute an ST map for a
// lens model across CPU threads and write it as an EXR.
//
//   mmtpu-lensdistort <out.exr> <width> <height> <direction:0|1>
//       <distortion> [squeeze] [curv_x] [curv_y] [quartic]

#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void mmtpu_stmap_classic(const double*, const double*, int, int, int,
                         int, float*);
int mmtpu_exr_write_rgba(const char*, const float*, int, int);
}

int main(int argc, char** argv) {
    if (argc < 6) {
        std::fprintf(
            stderr,
            "usage: %s <out.exr> <width> <height> <direction:0|1> "
            "<distortion> [squeeze] [curv_x] [curv_y] [quartic]\n",
            argv[0]);
        return 2;
    }
    const char* path = argv[1];
    const int width = std::atoi(argv[2]);
    const int height = std::atoi(argv[3]);
    const int direction = std::atoi(argv[4]);
    double lens[5] = {std::atof(argv[5]),
                      argc > 6 ? std::atof(argv[6]) : 1.0,
                      argc > 7 ? std::atof(argv[7]) : 0.0,
                      argc > 8 ? std::atof(argv[8]) : 0.0,
                      argc > 9 ? std::atof(argv[9]) : 0.0};
    double cam[5] = {3.6, 2.4, 0.0, 0.0, 1.0};

    std::vector<float> rgba(static_cast<size_t>(width) * height * 4);
    mmtpu_stmap_classic(lens, cam, width, height, direction, 0,
                        rgba.data());
    if (mmtpu_exr_write_rgba(path, rgba.data(), width, height) != 0) {
        std::fprintf(stderr, "failed to write %s\n", path);
        return 1;
    }
    std::printf("wrote %s (%dx%d)\n", path, width, height);
    return 0;
}
