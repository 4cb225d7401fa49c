// Field-dump driver for the UNMODIFIED reference 2D solver: runs an example
// configuration (0 = Taylor vortex, 2 = Rayleigh-Taylor — the density-
// carrying scene whose outputDensity the reference itself visualizes,
// main.cpp:108-132) and dumps raw float32 u/v/rho at selected frames, so
// the TPU engine's 2D BIMOCQ can be compared against the ACTUAL reference
// binary rather than only against our own NumPy oracle (round-2 verdict
// Missing #1).
//
// Usage: ref2d_dump <scheme> <example 0|2> <frames> <outdir>
// Dumps at frames {1, 2, 5, 10, 20, 50, frames}.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include "BimocqSolver2D.h"

static void dump(const Array2f &f, const char *dir, int frame,
                 const char *name) {
    char path[512];
    snprintf(path, sizeof path, "%s/f%04d_%s.bin", dir, frame, name);
    FILE *fp = fopen(path, "wb");
    if (!fp) { perror(path); exit(1); }
    fwrite(&f(0, 0), sizeof(float), (size_t)f.ni * f.nj, fp);
    fclose(fp);
}

int main(int argc, char **argv) {
    int scheme = (argc > 1) ? atoi(argv[1]) : 7;  // 7 = BIMOCQ
    int example = (argc > 2) ? atoi(argv[2]) : 2;
    int frames = (argc > 3) ? atoi(argv[3]) : 100;
    const char *outdir = (argc > 4) ? argv[4] : "/tmp/refdump";

    int nx, ny, N = 4;
    float dt, L, blend_coeff = 1.f;
    bool PURE_NEUMANN;
    float smoke_rise = 0.f, smoke_drop = 0.f;
    if (example == 0) {  // main.cpp:45-57
        nx = 256; ny = 256; dt = 0.025f; L = 2.f * M_PI;
        PURE_NEUMANN = false;
    } else {             // Rayleigh-Taylor, main.cpp:108-124
        nx = 256; ny = 1280; dt = 0.01f; L = 0.2f;
        PURE_NEUMANN = true; smoke_rise = 0.2f; smoke_drop = 0.05f;
    }

    Scheme sim_scheme = static_cast<Scheme>(scheme);
    BimocqSolver2D sim(nx, ny, L, blend_coeff, N, PURE_NEUMANN, sim_scheme);
    sim.setSmoke(smoke_rise, smoke_drop);
    sim.buildMultiGrid(PURE_NEUMANN);
    if (example == 0) sim.setInitVelocity(0.81f);
    else sim.setInitReyleighTaylor(0.5f * L * ny / nx);
    sim.sampleParticlesFromGrid();

    dump(sim.u, outdir, 0, "u");
    dump(sim.v, outdir, 0, "v");
    dump(sim.rho, outdir, 0, "rho");
    for (int i = 0; i < frames; i++) {
        sim.advance(dt, i);
        int f = i + 1;
        if (f == 1 || f == 2 || f == 5 || f == 10 || f == 20 || f == 50 ||
            f == frames) {
            dump(sim.u, outdir, f, "u");
            dump(sim.v, outdir, f, "v");
            dump(sim.rho, outdir, f, "rho");
        }
    }
    printf("{\"example\": %d, \"scheme\": %d, \"frames\": %d, \"out\": \"%s\"}\n",
           example, scheme, frames, outdir);
    return 0;
}
