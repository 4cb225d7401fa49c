// Field-dump driver for the UNMODIFIED reference 2D solver: runs an example
// configuration (main.cpp:40-223 parameters, verbatim) and dumps raw float32
// u/v/rho at selected frames, so the TPU engine's 2D schemes can be compared
// against the ACTUAL reference binary rather than only against our own NumPy
// oracle (round-2 verdict Missing #1; round-4 verdict Next #1).
//
// Examples: 0 = Taylor vortex (velocity only), 1 = vortex leapfrogging
// (main.cpp:73-104), 2 = Rayleigh-Taylor (main.cpp:108-132), 3 = Zalesak's
// disk (main.cpp:137-175 — rigid rotation, levelset in rho, CFL-driven
// substeps; the deterministic, NON-chaotic scene where an L-inf fidelity bar
// is well-posed).
//
// Usage: ref2d_dump <scheme> <example 0|1|2|3> <frames> <outdir> [perturb]
//   perturb: optional relative perturbation applied to the initial velocity
//   via the solver's public u/v members (e.g. 1e-7 = one f32 ulp class).
//   The reference source is untouched; this measures the reference's OWN
//   self-divergence under an ulp-level initial difference (noise floor of
//   any cross-implementation comparison on a chaotic scene).
// Dumps at frames {1, 2, 5, 10, 20, 50, 100, 157, 200, 250, 300, frames}.
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

static bool is_dump_frame(int f, int frames) {
    static const int marks[] = {1, 2, 5, 10, 20, 50, 100, 157, 200, 250, 300};
    for (int m : marks) if (f == m) return true;
    return f == frames;
}

int main(int argc, char **argv) {
    int scheme = (argc > 1) ? atoi(argv[1]) : 7;  // 7 = BIMOCQ
    int example = (argc > 2) ? atoi(argv[2]) : 2;
    int frames = (argc > 3) ? atoi(argv[3]) : 100;
    const char *outdir = (argc > 4) ? argv[4] : "/tmp/refdump";
    double perturb = (argc > 5) ? atof(argv[5]) : 0.0;

    int nx, ny, N = 4;
    float dt = 0.f, L, blend_coeff = 1.f, CFL = 0.f;
    bool PURE_NEUMANN;
    float smoke_rise = 0.f, smoke_drop = 0.f;
    switch (example) {
    case 0:  // Taylor vortex, main.cpp:45-57
        nx = 256; ny = 256; dt = 0.025f; L = 2.f * M_PI;
        PURE_NEUMANN = false;
        break;
    case 1:  // vortex leapfrogging, main.cpp:77-89
        nx = 256; ny = 256; dt = 0.025f; L = 2.f * M_PI;
        PURE_NEUMANN = false;
        break;
    case 3:  // Zalesak's disk, main.cpp:140-152
        nx = 200; ny = 200; CFL = 0.75f; L = 1.f;
        PURE_NEUMANN = true;
        break;
    default: // Rayleigh-Taylor, main.cpp:108-124
        nx = 256; ny = 1280; dt = 0.01f; L = 0.2f;
        PURE_NEUMANN = true; smoke_rise = 0.2f; smoke_drop = 0.05f;
        break;
    }

    Scheme sim_scheme = static_cast<Scheme>(scheme);
    BimocqSolver2D sim(nx, ny, L, blend_coeff, N, PURE_NEUMANN, sim_scheme);
    if (example == 3) sim.advect_levelset = true;  // main.cpp:155
    sim.setSmoke(smoke_rise, smoke_drop);
    sim.buildMultiGrid(PURE_NEUMANN);
    switch (example) {
    case 0: sim.setInitVelocity(0.81f); break;
    case 1:  // main.cpp:92-93
        sim.setInitLeapFrog(1.5f, 3.0f, M_PI - 1.6f, 0.3f);
        sim.applyVelocityBoundary();
        break;
    case 3: sim.setInitZalesak(); break;  // main.cpp:157
    default: sim.setInitReyleighTaylor(0.5f * L * ny / nx); break;
    }
    sim.sampleParticlesFromGrid();

    if (perturb != 0.0) {  // harness-side ulp nudge via public members
        // velocity AND density: buoyancy-driven scenes (Rayleigh-Taylor)
        // start from u = v = 0, where a multiplicative velocity nudge is
        // a no-op — the density field is the seed there
        for (int j = 0; j < ny; j++)
            for (int i = 0; i < nx + 1; i++) {
                sim.u(i, j) *= (1.f + (float)perturb);
                sim.u_init(i, j) = sim.u(i, j);
                sim.u_origin(i, j) = sim.u(i, j);
            }
        for (int j = 0; j < ny; j++)
            for (int i = 0; i < nx; i++) {
                sim.rho(i, j) *= (1.f + (float)perturb);
                sim.rho_init(i, j) = sim.rho(i, j);
                sim.rho_orig(i, j) = sim.rho(i, j);
            }
    }

    dump(sim.u, outdir, 0, "u");
    dump(sim.v, outdir, 0, "v");
    dump(sim.rho, outdir, 0, "rho");
    if (example == 3) {
        // main.cpp:159-172: frame_dt=2, CFL-limited substeps per frame
        for (int i = 1; i < frames; i++) {
            float frame_dt = 2.f, T = 0.f;
            float substep = CFL * sim.h / sim.maxVel();
            while (T < frame_dt) {
                if (T + substep > frame_dt) substep = frame_dt - T;
                sim.advance(substep, i);
                T += substep;
            }
            if (is_dump_frame(i, frames - 1)) {
                dump(sim.u, outdir, i, "u");
                dump(sim.v, outdir, i, "v");
                dump(sim.rho, outdir, i, "rho");
            }
        }
    } else {
        for (int i = 0; i < frames; i++) {
            sim.advance(dt, i);
            int f = i + 1;
            if (is_dump_frame(f, frames)) {
                dump(sim.u, outdir, f, "u");
                dump(sim.v, outdir, f, "v");
                dump(sim.rho, outdir, f, "rho");
            }
        }
    }
    printf("{\"example\": %d, \"scheme\": %d, \"frames\": %d, \"out\": \"%s\", "
           "\"perturb\": %g}\n", example, scheme, frames, outdir, perturb);
    return 0;
}
