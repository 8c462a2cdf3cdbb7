from ocm_ray.cli import main

raise SystemExit(main())
