SELECT * FROM (VALUES
(CAST('Award' AS VARCHAR),CAST(110 AS BIGINT),CAST(1.0 AS DOUBLE)),
('Residence_period',119,1.0),
('Being_born',119,1.0),
('Parenting',101,1.0),
('Marriage',104,1.0),
('Work',110,1.0),
('Residence',92,1.0),
('Death',207,0.927536),
('Education',218,0.827217),
('Occupation',125,1.0)
) AS t("frame","n","avg_conf")