SELECT * FROM (VALUES
(CAST('Award' AS VARCHAR),CAST(126 AS BIGINT),CAST(1.0 AS DOUBLE)),
('Being_born',127,1.0),
('Parenting',112,1.0),
('Marriage',116,1.0),
('Work',125,1.0),
('Residence',126,1.0),
('Death',234,0.924908),
('Education',202,0.838284),
('Occupation',96,1.0)
) AS t("frame","n","avg_conf")