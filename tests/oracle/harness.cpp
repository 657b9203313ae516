// Oracle dump harness for parity testing.
//
// Builds the UNMODIFIED reference sources (mounted read-only at
// /root/reference) by textually including them, and dumps every pipeline
// stage to a simple binary tensor file that tests/oracle/convert.py turns
// into .npz fixtures.  No reference code lives in this repo; this TU only
// calls it.  The #include of sift.cpp pulls the anonymous-namespace internals
// (src/sift.cpp:7-697) into this TU so stage-level intermediates are
// reachable.
//
// Build (see tests/oracle/build.sh):
//   g++ -O2 -std=c++17 -I $REF/src harness.cpp $REF/src/image_io.cpp \
//       $REF/src/image.cpp -o oracle
//
// Usage: ./oracle <image> <out.bin> [stages|final]
//        ./oracle match <dumpA.bin-prefix-unused> ... (matching is done in
//        Python from the dumped descriptors; exact integer math).

#include <array>  // reference sift.cpp uses std::array without including it
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "sift.cpp"  // reference implementation, anonymous namespace exposed

static FILE* g_out = nullptr;

static void dump_tensor(const std::string& name, const char dtype,
                        const std::vector<int64_t>& dims, const void* data,
                        size_t elem_size) {
    uint32_t name_len = name.size();
    fwrite(&name_len, 4, 1, g_out);
    fwrite(name.data(), 1, name_len, g_out);
    fwrite(&dtype, 1, 1, g_out);
    uint32_t ndim = dims.size();
    fwrite(&ndim, 4, 1, g_out);
    int64_t total = 1;
    for (int64_t d : dims) {
        fwrite(&d, 8, 1, g_out);
        total *= d;
    }
    fwrite(data, elem_size, total, g_out);
}

static void dump_image(const std::string& name, const Image& img) {
    dump_tensor(name, 'd', {img.height, img.width}, img.data.data(), 8);
    // reference Image stores row-major (y*width+x)*channels (image_io.cpp:81-83)
}

static void dump_keypoints(const std::string& prefix,
                           const std::vector<Keypoint>& kps, bool with_desc) {
    std::vector<double> xs, ys, sizes, poris;
    std::vector<int32_t> octs, layers;
    std::vector<uint8_t> descs;
    for (const auto& k : kps) {
        xs.push_back(k.x);
        ys.push_back(k.y);
        sizes.push_back(k.size);
        poris.push_back(k.pori);
        octs.push_back(k.octave);
        layers.push_back(k.layer);
        if (with_desc)
            descs.insert(descs.end(), k.desc, k.desc + 128);
    }
    int64_t n = kps.size();
    dump_tensor(prefix + ".x", 'd', {n}, xs.data(), 8);
    dump_tensor(prefix + ".y", 'd', {n}, ys.data(), 8);
    dump_tensor(prefix + ".size", 'd', {n}, sizes.data(), 8);
    dump_tensor(prefix + ".pori", 'd', {n}, poris.data(), 8);
    dump_tensor(prefix + ".octave", 'i', {n}, octs.data(), 4);
    dump_tensor(prefix + ".layer", 'i', {n}, layers.data(), 4);
    if (with_desc)
        dump_tensor(prefix + ".desc", 'B', {n, 128}, descs.data(), 1);
}

int main(int argc, char** argv) {
    if (argc < 3) {
        std::cerr << "usage: oracle <image> <out.bin> [stages|final]\n";
        return 1;
    }
    const std::string img_path = argv[1];
    const std::string out_path = argv[2];
    const bool dump_stages = argc > 3 && std::string(argv[3]) == "stages";

    g_out = fopen(out_path.c_str(), "wb");
    if (!g_out) {
        std::cerr << "cannot open " << out_path << "\n";
        return 1;
    }

    // Mirror detect_keypoints_and_descriptors (src/sift.cpp:712-776) with the
    // default parameters (src/sift.hh:65-71), dumping each stage.
    const bool double_image_size = true;
    const double init_sigma = 1.6;
    const int intervals = 3;
    const int window_size = 3;
    const double contrast_threshold = 0.04;
    const double eigen_ratio = 10.0;
    const double num_bins = 36;
    const double peak_ratio = 0.8;
    const double ori_sigma_factor = 1.5;
    const double desc_scale_factor = 3.0;

    Image img(img_path);
    // Dump the stb-decoded pixels: JPEG decoders differ (stb vs libjpeg), so
    // parity tests feed the oracle's own decoded image into the rebuild.
    dump_tensor("input", 'd', {img.height, img.width, img.channels},
                img.data.data(), 8);
    Image initial_image =
        compute_initial_image(img, double_image_size, init_sigma);
    if (dump_stages)
        dump_image("initial", initial_image);

    int octaves_count =
        compute_octaves_count(initial_image.width, initial_image.height);
    int64_t oc64 = octaves_count;
    dump_tensor("octaves_count", 'q', {1}, &oc64, 8);

    std::vector<double> gaussian_kernels =
        compute_gaussian_kernels(init_sigma, intervals);
    dump_tensor("gaussian_kernels", 'd',
                {(int64_t)gaussian_kernels.size()}, gaussian_kernels.data(), 8);

    auto gaussian_images =
        compute_gaussian_images(initial_image, octaves_count, gaussian_kernels);
    auto dog_images =
        compute_dog_images(gaussian_images, octaves_count, intervals);
    if (dump_stages) {
        for (int o = 0; o < octaves_count; ++o)
            for (size_t i = 0; i < gaussian_images[o].size(); ++i)
                dump_image("gauss." + std::to_string(o) + "." + std::to_string(i),
                           gaussian_images[o][i]);
        for (int o = 0; o < octaves_count; ++o)
            for (size_t i = 0; i < dog_images[o].size(); ++i)
                dump_image("dog." + std::to_string(o) + "." + std::to_string(i),
                           dog_images[o][i]);
    }

    auto extrema = detect_extrema(dog_images, gaussian_kernels, intervals,
                                  window_size, contrast_threshold);
    {
        std::vector<int32_t> ext;
        for (auto& e : extrema) {
            ext.push_back((int32_t)std::get<0>(e));  // x
            ext.push_back((int32_t)std::get<1>(e));  // y
            ext.push_back(std::get<2>(e));           // layer
            ext.push_back(std::get<3>(e));           // octave
        }
        dump_tensor("extrema", 'i', {(int64_t)extrema.size(), 4}, ext.data(), 4);
    }

    auto keypoints = compute_keypoints(dog_images, extrema, gaussian_kernels,
                                       init_sigma, window_size, intervals,
                                       contrast_threshold, eigen_ratio);
    if (dump_stages)
        dump_keypoints("refined", keypoints, false);

    keypoints = compute_orientations(keypoints, gaussian_kernels,
                                     gaussian_images, num_bins, peak_ratio,
                                     ori_sigma_factor, double_image_size);
    if (dump_stages)
        dump_keypoints("oriented", keypoints, false);

    clean_keypoints(keypoints);
    compute_descriptors(keypoints, gaussian_images, desc_scale_factor,
                        double_image_size);
    dump_keypoints("final", keypoints, true);

    fclose(g_out);
    std::cerr << "dumped " << keypoints.size() << " keypoints to " << out_path
              << "\n";
    return 0;
}
