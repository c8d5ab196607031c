// Seed data for the demo stack — same content the reference's init-mongo.js
// intended to load (2 apartments, 3 pending images, unique index on
// analysis_results.apartment_id) but never did, because the reference
// docker-compose never mounted it (SURVEY.md §3 integration gaps).
db = db.getSiblingDB("interior_analysis");

db.apartments.insertMany([
  { _id: "apt1", title: "Mieszkanie 3-pokojowe, Centrum" },
  { _id: "apt2", title: "Kawalerka, Stare Miasto" },
]);

db.images.insertMany([
  {
    _id: "img1",
    apartment_id: "apt1",
    url: "https://example.com/apt1_salon.jpg",
    analysis_status: "pending",
  },
  {
    _id: "img2",
    apartment_id: "apt1",
    url: "https://example.com/apt1_kuchnia.jpg",
    analysis_status: "pending",
  },
  {
    _id: "img3",
    apartment_id: "apt2",
    url: "https://example.com/apt2_pokoj.jpg",
    analysis_status: "pending",
  },
]);

db.analysis_results.createIndex({ apartment_id: 1 }, { unique: true });
